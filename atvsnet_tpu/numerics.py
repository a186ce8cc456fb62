"""Trace-scoped numerics policy: quantization, fp32 conv precision, VMEM budget.

Round 3 exposed these as process-level env vars read at trace time
(ATVSNET_ACT_QUANT / ATVSNET_WARP_QUANT / ATVSNET_FP32_PRECISION /
ATVSNET_SCOPED_VMEM_KIB) — a footgun: flipping one mid-process silently served
stale jit-compiled programs, and serving's bucket registry (which keys compiled
programs on PipelineConfig) couldn't see them. Now they are PipelineConfig fields
(config.py) so every knob participates in jit cache keys and bucket identity; the
model entry points install the config's policy here for the duration of tracing,
and the leaf primitives (nn/layers, geometry/warp, ops/softargmin) read it from
this scope instead of os.environ. Env vars survive only as CLI/bench argparse
DEFAULTS that construct configs (host-side, before any trace).

Correctness: the scope is entered at trace time by functions whose enclosing jit
keys on the frozen config (static argument / closure identity), so two configs
differing only in a numerics field trace and cache as distinct programs.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import inspect
import threading

ACT_QUANT_MODES = ("none", "int8", "int8s", "int8mxu")
WARP_QUANT_MODES = ("none", "int8")
FP32_PRECISION_MODES = ("highest", "high", "default")


@dataclasses.dataclass(frozen=True)
class NumericsPolicy:
    # int8 activation storage for 5D volume conv_bn/deconv_bn links
    # (nn/layers._maybe_quant_act; int8mxu additionally runs provenance-audited
    # volume convs with int8 operands on the MXU's native int8 path)
    act_quant: str = "none"
    # static-lattice clip range in BN-output sigmas (layers._maybe_quant_act)
    act_quant_range: float = 6.0
    # int8 storage for bilinear plane-sweep warped volumes (geometry/warp)
    warp_quant: str = "none"
    # fp32 conv MXU pass count: highest (6-pass) | high (3-pass) | default (1-pass)
    fp32_precision: str = "highest"
    # scoped-VMEM limit the Pallas soft-argmin sizes its blocks against, KiB;
    # None = the TPU compiler's default 16 MiB (ops/softargmin._vmem_budget)
    scoped_vmem_kib: int | None = None

    def __post_init__(self):
        if self.act_quant not in ACT_QUANT_MODES:
            raise ValueError(
                f"act_quant={self.act_quant!r}: expected one of {'|'.join(ACT_QUANT_MODES)}")
        if self.warp_quant not in WARP_QUANT_MODES:
            raise ValueError(
                f"warp_quant={self.warp_quant!r}: expected one of {'|'.join(WARP_QUANT_MODES)}")
        if self.fp32_precision not in FP32_PRECISION_MODES:
            raise ValueError(
                f"fp32_precision={self.fp32_precision!r}: expected one of "
                f"{'|'.join(FP32_PRECISION_MODES)}")


DEFAULT = NumericsPolicy()
_state = threading.local()


def current() -> NumericsPolicy:
    """The active policy (DEFAULT outside any scope)."""
    return getattr(_state, "policy", DEFAULT)


@contextlib.contextmanager
def scope(policy: NumericsPolicy):
    """Install `policy` for the duration of a trace (re-entrant, thread-local)."""
    prev = getattr(_state, "policy", DEFAULT)
    _state.policy = policy
    try:
        yield
    finally:
        _state.policy = prev


def install_scope(fn):
    """Decorator for model entry points: run `fn` under the numerics policy of
    its `cfg` argument (a PipelineConfig). jit tracing happens on the calling
    thread inside the call, so every leaf primitive the body reaches —
    including lax.scan/vmap bodies and value_and_grad — sees the policy.
    Soundness relies on the ENCLOSING jit keying on cfg (closure identity or
    static arg), which every driver/serving bucket does."""
    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        cfg = sig.bind(*args, **kwargs).arguments["cfg"]
        with scope(cfg.numerics()):
            return fn(*args, **kwargs)

    return wrapper
