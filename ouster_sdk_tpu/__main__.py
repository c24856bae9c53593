"""`python -m ouster_sdk_tpu` entry point (ouster-cli equivalent)."""

from ouster_sdk_tpu.cli import cli

if __name__ == "__main__":
    cli()
