from . import scalars, text  # noqa: F401
