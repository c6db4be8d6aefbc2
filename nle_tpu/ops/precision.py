"""Stage-2 MXU dot-precision policy (NLE_STAGE2_DOTS).

The device stages trace under jax.default_matmul_precision("highest"):
on f32 operands the TPU MXU realizes every dot as SIX bf16 passes
(3-piece operand split, all 9 cross terms minus the 3 smallest). That is
the right call for the fidelity-critical host-adjacent algebra, but the
three N-scale stage-2 GEMMs — the phi build K_AB @ Uinv, the Sb gram
(c phi)^T (c phi), and the stage-2b eigenvector tail (c phi) @ GrT — are
MXU-PASS-bound at the 1 MP serving shape (the int16 Sinkhorn work showed
the same wall: ops/pallas/sinkhorn_kernel.py _resolve_int16), and their
results already tolerate the int16 carrier's 2^-16-class trajectory
noise (golden-gated on the real chip, GOLDEN_TPU.jsonl).

NLE_STAGE2_DOTS selects per SITE which of those GEMMs run the classic
3-pass split: a = ah + al + a2 with ah = bf16(a), al = bf16(a - ah),
|a2| <= |a| * 2^-16, and

    a.b ~= ah.bh + ah.bl + al.bh        (al.bl and the a2/b2 tails dropped)

leaving an error ~3 * 2^-16 relative to the accumulated TERM magnitude.
That last distinction is the load-bearing one (CPU golden bisection,
2026-08-20): on a cancellation-heavy dot the result entry can be far
smaller than its terms, making the split error O(1) RELATIVE TO THE
ENTRY. The phi build K_AB @ Uinv is exactly that case — eigenvector
columns oscillate and cancel — and splitting it collapses bird to
8.3 dB / rock2 to 21 dB (vs ~63 dB f32; worse than even the bf16
Sinkhorn carrier's 27 dB, because here the STORED phi itself is
corrupted, not just the balancing trajectory). The Sb gram and the V
tail contract the SCALED factor diag(c) phi whose balanced columns are
O(1)-equilibrated — bird holds 63.2/63.3 dB with either split on — so
the default ("auto") splits the two safe sites, gram and v, on the TPU
backend only, and keeps the 6-pass exact dot on the phi build
everywhere (and on every site on CPU, where f32 dots are exact and the
split would be pure fidelity downside).

The split is written out BY HAND rather than via
jax.lax.Precision.HIGH so that (a) Mosaic can lower it inside Pallas
kernels (Mosaic only lowers DEFAULT/HIGHEST), and (b) the CPU backend
executes the SAME arithmetic (XLA:CPU ignores precision flags and
would silently run exact f32), making the mode's golden fidelity
certifiable off-chip before the on-chip gate
(tools/golden_sweep.py with NLE_STAGE2_DOTS=...).

Scope: ONLY the three N-scale stage-2 GEMMs named above. The Sinkhorn
sweeps have their own carrier policy (int16, sinkhorn_kernel.py); the
(N, k) apply dots, the streaming phi-free kernels (exp-bound, no MXU
wall), and every host/f64 island are untouched.

Read at TRACE time like the other stage-2 knobs: set before the first
training of a shape, or use a fresh process.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


_SITES = ("phi", "gram", "v")


def stage2_dots(site: str, on_tpu: bool | None = None,
                in_kernel: bool = False) -> str:
    """Resolve NLE_STAGE2_DOTS for one of the three gated GEMM sites —
    "phi" (the K_AB @ Uinv build), "gram" (Sb), "v" (the stage-2b tail).

    Values: "auto" (default — split the SAFE sites, gram and v, and
    only when the default backend is TPU: on CPU there is no MXU-pass
    wall, a f32 dot is exact, and the split would cost fidelity for
    zero speed-up, so the CPU oracle-parity tests keep exact dots —
    the same backend scoping the int16 Sinkhorn carrier's fused-path
    gate gives it), "highest" (6-pass exact dots everywhere — the
    pre-r3 behavior; what bit-exact machinery comparisons pin, e.g.
    tools/check_tpu_sharded.py), "high" (split at every site on any
    backend — EXPERIMENTS ONLY: the phi site is NOT golden-safe), or a
    comma list of sites to force on any backend (e.g. "gram,v" — how
    the CPU certification sweep executes the split arithmetic
    off-chip). Per-site granularity exists because the sites differ in
    cancellation sensitivity (module docstring).

    `on_tpu` overrides the auto rule's backend probe: callers that know
    which devices will EXECUTE the trace (the sharded trainers run on a
    mesh whose platform can differ from jax.default_backend(), e.g. a
    virtual CPU mesh inside a TPU-default process) resolve it from the
    mesh once at jit-key time and pass it here, so the mode can neither
    probe the wrong backend nor silently change between trace and run
    (the trace-time-env hazard flagged in ADVICE r3)."""
    if site not in _SITES:
        raise ValueError(f"unknown stage-2 dot site {site!r}")
    raw = os.environ.get("NLE_STAGE2_DOTS", "auto").lower()
    if raw == "auto":
        tpu = (jax.default_backend() == "tpu" if on_tpu is None
               else on_tpu)
        # auto splits only IN-KERNEL sites (the scaled Pallas gram/matmul,
        # where the 3-pass form halves genuine MXU passes in VMEM). The
        # XLA small-path gram/V measured a ~1% win from the split (r3) —
        # but its changed trajectory cost taj-denoise 15 dB of golden
        # margin on the chip (63.1 -> 48.2, measured r4 via a
        # DOTS=highest bisection): pure fidelity downside there. Forced
        # modes ("high"/site lists) still apply everywhere (the CPU
        # certification sweeps need that).
        return ("high" if site != "phi" and tpu and in_kernel
                else "highest")
    if raw == "highest":
        return "highest"
    if raw == "high":
        return "high"
    parts = {s.strip() for s in raw.split(",") if s.strip()}
    unknown = parts - set(_SITES)
    if unknown:
        raise ValueError(
            f"NLE_STAGE2_DOTS={raw!r}: expected auto|high|highest or a "
            f"comma list of {_SITES}")
    return "high" if site in parts else "highest"


def split_bf16(x: jax.Array):
    """x (f32) as (hi, lo) bf16 with hi + lo capturing the top 16
    mantissa bits: hi = bf16(x), lo = bf16(x - hi)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_general_3pass(a: jax.Array, b: jax.Array, dimension_numbers):
    """f32 dot_general as 3 native bf16 MXU passes with f32 accumulation
    (the Precision.HIGH decomposition, hand-built — see module
    docstring). Inputs f32, output f32."""
    ah, al = split_bf16(a)
    bh, bl = split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def stage2_matmul(a: jax.Array, b: jax.Array, site: str) -> jax.Array:
    """a @ b for the gated stage-2 GEMMs: 3-pass split when the site
    resolves to "high", ambient-precision ("highest" in the stage-2
    jits) otherwise. The split applies to f32 ONLY — f64 runs (the
    golden-oracle pipeline) always take the exact dot."""
    if a.dtype == jnp.float32 and stage2_dots(site) == "high":
        if b.dtype != jnp.float32:
            raise TypeError(
                f"stage2_matmul split path needs f32 operands, got "
                f"b.dtype={b.dtype}; cast explicitly — split_bf16 would "
                "silently narrow it through bf16")
        return dot_general_3pass(a, b, (((1,), (0,)), ((), ())))
    return jnp.dot(a, b, preferred_element_type=a.dtype)


def stage2_gram(a: jax.Array) -> jax.Array:
    """a^T @ a for the gated Sb reduction (contract over rows); f32-only
    split like stage2_matmul."""
    if a.dtype == jnp.float32 and stage2_dots("gram") == "high":
        return dot_general_3pass(a, a, (((0,), (0,)), ((), ())))
    return jax.lax.dot_general(
        a, a, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype)
