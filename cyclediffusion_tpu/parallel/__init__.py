"""Device-mesh parallelism: data-parallel sharded inference over ICI/DCN.

Replaces the reference's torch.distributed/NCCL machinery
(``trainer/trainer.py:43-61, 174-179, 259-330``) with jax.sharding: a 1-D
``data`` mesh, NamedSharding on the batch axis, replicated params, and XLA
collectives inserted by the compiler.  The reference's 8 independent
single-GPU jobs over dataset slices (README.md:150-231) collapse into one
sharded run.
"""

from cyclediffusion_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
