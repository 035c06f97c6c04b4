"""Multi-stream batching and device-mesh sharding.

The reference is a single-GPU-context desktop app; its only concurrency
is one producer thread and fragment-shader data parallelism (SURVEY.md
section 2, "parallelism strategies"). The TPU-native scale-out axes:

* **streams** (the data-parallel axis): many independent audio streams
  batched per chip (vmap) and sharded across chips — each stream is one
  reference-process-equivalent;
* **rows** (the spatial axis): frame rows sharded across chips for
  large outputs — the rasterizer is pixel-parallel, so XLA partitions
  it with an all-gather of the (tiny) spectrum textures.

All communication is XLA-inserted collectives over ICI via
``jax.sharding`` — there is no hand-written transport (the reference's
"transports" were a mutex and GLX texture sharing; SURVEY.md section 5).
"""

from glava_tpu.parallel.batch import BatchedRenderer  # noqa: F401
from glava_tpu.parallel.mesh import make_mesh, stream_sharding  # noqa: F401
