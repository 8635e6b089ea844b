"""Device-mesh parallelism: mesh construction, sharding rules, sharded train/infer."""

from eraxvif5tts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
)
