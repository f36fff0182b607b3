from ezaudio_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    param_shardings,
)
from ezaudio_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    ring_context,
)
