"""Backend helpers shared by all device kernels.

Pallas TPU kernels only compile on real TPU hardware; everywhere else
(CPU CI, the 8-device virtual mesh used by the test-suite) they run in
interpreter mode.  Keeping the switch in one place lets every kernel be
written once and tested anywhere.
"""

import functools

import jax


@functools.cache
def default_backend() -> str:
    return jax.default_backend()


@functools.cache
def on_tpu() -> bool:
    return default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Whether pallas_call should run in interpret mode."""
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
