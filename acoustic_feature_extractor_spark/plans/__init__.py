from . import lineage, pipeline  # noqa: F401
