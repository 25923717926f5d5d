"""Mesh / collective layer — the framework's first-class parallelism API.

The reference library has no distributed code (SURVEY.md §2.3); its recipes
lean on Lightning DDP.  Here parallelism is a core component: device meshes,
named sharding rules for the model zoo, and sharded train/infer steps built
on ``jax.sharding`` + ``jit`` so XLA inserts ICI/DCN collectives.
"""

from .decode import shard_encoder_state, shard_streams, sharded_infer_batch
from .mesh import create_mesh, default_mesh, host_chip_mesh, init_distributed
from .sharding import (
    batch_sharding,
    lattice_spec,
    replicate,
    rnnt_rules,
    shard_rnnt_params,
    shard_wav2vec2_params,
    wav2vec2_rules,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "shard_encoder_state",
    "shard_streams",
    "sharded_infer_batch",
    "default_mesh",
    "host_chip_mesh",
    "init_distributed",
    "lattice_spec",
    "replicate",
    "rnnt_rules",
    "shard_rnnt_params",
    "shard_wav2vec2_params",
    "wav2vec2_rules",
]
