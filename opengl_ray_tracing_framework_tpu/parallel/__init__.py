from .sharding import (
    make_mesh,
    render_pass_sharded,
    replicate_scene,
)

__all__ = ["make_mesh", "render_pass_sharded", "replicate_scene"]
