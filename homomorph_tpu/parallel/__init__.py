"""Multi-chip scale-out: mesh construction + sharded bulk pipelines."""

from . import bulk, mesh  # noqa: F401
from .mesh import ShardingConfig, make_mesh  # noqa: F401
