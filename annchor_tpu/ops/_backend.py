"""Backend helpers shared by all device kernels.

Pallas TPU kernels only compile on real TPU hardware; everywhere else
(CPU CI, the 8-device virtual mesh used by the test-suite) they run in
interpreter mode.  Keeping the switch in one place lets every kernel be
written once and tested anywhere.
"""

import contextlib
import functools
import os

import jax


@functools.cache
def default_backend() -> str:
    return jax.default_backend()


# Below this many elements a kernel launch is latency-bound, not
# compute-bound: when the accelerator sits behind a network tunnel a
# dispatch costs ~0.1-0.6 s while the arithmetic is microseconds, so
# small bookkeeping ops (per-point thresholds, graph assembly on a few
# thousand points) run on the host CPU backend instead.
SMALL_OP_ELEMENTS = int(
    os.environ.get("ANNCHOR_TPU_SMALL_OP_ELEMENTS", 4_000_000)
)


@functools.cache
def _cpu_device():
    return jax.devices("cpu")[0]


def maybe_cpu(n_elements: int):
    """Context manager routing ops below the size threshold to CPU."""
    if n_elements < SMALL_OP_ELEMENTS and default_backend() != "cpu":
        return jax.default_device(_cpu_device())
    return contextlib.nullcontext()


@functools.cache
def on_tpu() -> bool:
    return default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Whether pallas_call should run in interpret mode.

    Checks the *effective* default device (jax_default_device config
    overrides the platform default — the test-suite pins CPU this
    way), falling back to the default backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) != "tpu"
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
