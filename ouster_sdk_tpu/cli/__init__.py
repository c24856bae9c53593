from .core import cli, main  # noqa: F401
from . import extra  # noqa: F401  (registers additional commands)
