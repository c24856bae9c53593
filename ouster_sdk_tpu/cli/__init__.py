from .core import cli, main  # noqa: F401
