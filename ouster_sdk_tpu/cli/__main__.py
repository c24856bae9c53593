"""`python -m ouster_sdk_tpu.cli` entry point."""

from ouster_sdk_tpu.cli import cli

if __name__ == "__main__":
    cli()
