"""Device-mesh parallelism.

The reference has NO parallelism of any kind (SURVEY.md §2.5: one CUDA device,
one OS process per task, file IPC). This package is therefore new design, not
a port: a ``("data", "model")`` mesh where the data axis shards segment
batches (the pipeline's natural unit — segments are independent) and the
model axis tensor-shards attention heads + MLP for larger-than-chip or
latency-critical serving. Collectives are whatever XLA inserts for the
shardings — we never hand-write NCCL-style calls.
"""

from clearconverse_tpu.parallel.mesh import build_mesh, local_device_count  # noqa: F401
from clearconverse_tpu.parallel.sharding import (  # noqa: F401
    whisper_param_spec, batch_spec, shard_params, replicated_spec)
