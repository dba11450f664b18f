"""Multi-chip scaling: frame-level data parallelism over a device mesh.

The reference is single-process/single-thread (SURVEY.md §2); its natural
TPU scaling axis is streams/frames (multi-camera skins, BASELINE.json
configs 4-5), not spatial sharding — FFT stages want whole frames.  This
package maps frame batches over a ``jax.sharding.Mesh`` and fuses
cross-stream summaries with collectives over ICI.
"""

from vistaf_tpu.parallel.distributed import (  # noqa: F401
    global_stream_count,
    initialize_multihost,
    is_multihost_env,
)
from vistaf_tpu.parallel.mesh import (  # noqa: F401
    make_stream_mesh,
    shard_batch,
    BatchedForce,
    whole_limb_step,
)
