"""Multi-chip scale-out: mesh construction + sharded bulk pipelines."""

from . import bulk, limbmul, mesh  # noqa: F401
from .limbmul import (  # noqa: F401
    get_default_limb_mesh,
    set_default_limb_mesh,
    sharded_clmul,
    use_limb_mesh,
)
from .mesh import ShardingConfig, make_mesh  # noqa: F401
