import os
import sys

# --threads must land in the environment BEFORE jax/numpy initialize their
# CPU thread pools (importing .cli pulls in the whole package), so pre-scan
# the argv instead of waiting for argparse.
def _prescan_threads(argv):
    for i, arg in enumerate(argv):
        value = None
        if arg.startswith("--threads="):
            value = arg.split("=", 1)[1]
        elif arg == "--threads" and i + 1 < len(argv):
            value = argv[i + 1]
        if value is None:
            continue
        try:
            threads = int(value)
        except ValueError:
            return  # let argparse report it
        if threads > 0:
            os.environ["OMP_NUM_THREADS"] = str(threads)
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_cpu_multi_thread_eigen={str(threads > 1).lower()}"
            ).strip()
        return


_prescan_threads(sys.argv[1:])

from .cli import cli  # noqa: E402

cli()
