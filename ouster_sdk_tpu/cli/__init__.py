from .core import cli, main  # noqa: F401
from . import extra  # noqa: F401  (registers additional commands)
from .runner import (  # noqa: F401
    SourceArgsException,
    find_plugins,
    run,
)
