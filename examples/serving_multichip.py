"""Multi-chip batched serving: shard 30 s windows data-parallel over a mesh.

Run with real chips, or simulate with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
Results are identical to single-device (tests/test_parallel.py).
"""

import sys

from asr_ttl_mtl_tpu.models import load_model
from asr_ttl_mtl_tpu.parallel.mesh import create_mesh
from asr_ttl_mtl_tpu.transcribe import transcribe_batch


def main():
    files = sys.argv[1:]
    model = load_model("base")
    mesh = create_mesh((0, 1))  # 0 = all devices on the dp axis
    results = transcribe_batch(
        model, files, batch_size=32, mesh=mesh,
        language="en", without_timestamps=True,
    )
    for f, r in zip(files, results):
        print(f"{f}: {r['text']}")


if __name__ == "__main__":
    main()
