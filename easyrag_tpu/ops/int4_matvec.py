"""Pallas matvec over nibble-packed int4 weights — decode's bandwidth fix.

B=1 decode at 7B is weight-bandwidth-bound (BASELINE.md: 10.8 ms/step int8
reads the whole 7.1 GiB tree at 657 GB/s), so int4 weights are worth ~2x
tok/s *only if the nibbles stay packed all the way to the chip*. The XLA
int4 path (``layers._linear`` w_p branch) does not deliver that: the
shift/mask unpack materializes an int8 copy of every weight between HBM
and the matmul (measured 16.3 ms/step at 7B — WORSE than int8, because the
step now writes + re-reads the unpacked bytes). This kernel unpacks inside
VMEM: HBM traffic is exactly the packed ``[O, I/2]`` int8 bytes, streamed
once per step through the pipelined grid, so the step rides the true
0.5-byte/weight roofline.

Layout contract (``hf_loader.quantize_linear_int4``): *deinterleaved
halves* — byte ``w_p[o, i]`` holds input column ``i`` in its low nibble
and column ``i + I/2`` in its high nibble. Unpacking is then two full-tile
shifts (no lane interleave anywhere):

    lo = sign_extend(w_p << 4 >> 4)   -> columns [0, I/2)
    hi = w_p >> 4 (arithmetic)        -> columns [I/2, I)
    y  = (x[:, :I/2] @ lo.T + x[:, I/2:] @ hi.T) * scale

Grid = output blocks; each program DMAs one ``[bo, I/2]`` packed block
(Pallas double-buffers it against the previous block's compute), unpacks
on the VPU, runs two contraction-``I/2`` MXU passes, and rescales. The
block size adapts to VMEM (down_proj's I/2 = 9472 needs smaller blocks
than the 1792 of the attention projections).

Numerics: identical dequantized values (the nibbles are exact in bf16);
accumulation is f32 like the XLA path. The two paths may differ by bf16
tie-level tiling effects only (same situation as flash64); parity is
pinned in tests/test_int4.py.

Reference scope: the reference's generation path is torch ``generate`` on
a 16 GB GPU (``/root/reference/src/easyrag/utils/llm_utils.py:58-73``);
this kernel is TPU-native capability beyond it (weight-only int4 serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per program: packed block (x2 for double buffering) + both
# unpacked bf16 halves. 12 MB leaves headroom under the ~16 MB arena.
_VMEM_BUDGET = 12 * 2**20
_MAX_ROWS = 64  # past this the matmul is compute-bound: use the XLA path


def _block_out(n_out: int, half_in: int) -> int:
    """Largest output-block size that divides n_out and fits VMEM.

    Largest-first was re-validated END-TO-END in r5 after an isolated
    per-shape probe (``tools/exp_int4_unpack.py``) suggested the
    opposite: in that probe (one pallas_call per matvec + a reduction
    between calls) gate_proj [18944, 1792] measured 80.8 us at bo=512
    vs 27.9 us at bo=128, but flipping this policy to smallest-first
    REGRESSED the real decode step 6.41 -> 8.17 ms/step
    (``tools/bench_decode.py --quant int4``). Inside the real 196-
    matvec step the compiler pipelines consecutive kernels' DMAs, and
    wide blocks (fewer grid steps) win; the isolated probe's per-call
    boundaries reward deep single-kernel grids instead. Probe numbers
    for THIS kernel are directional only — trust the product
    measurement.

    VMEM estimate: 2 packed buffers (int8, double-buffered) + lo/hi
    unpacked (bf16, 2 bytes each). It deliberately EXCLUDES the int32
    unpack intermediates (up to +12 B/element if materialized): Mosaic
    fuses the elementwise unpack into the dot operand load, and the
    largest production shape (bo=128, half_in=9472, 7.3 MB by this
    formula) compiles and runs on hardware (BASELINE.md int4 decode).
    If a future Mosaic regression materializes the int32 tiles, this
    budget must grow a +3*4*bo*half_in term."""
    for bo in (1024, 512, 256, 128):
        if n_out % bo:
            continue
        if bo * half_in * (2 * 1 + 2 * 2) <= _VMEM_BUDGET:
            return bo
    return 0


def supported(x_rows: int, n_out: int, half_in: int) -> bool:
    return (
        0 < x_rows <= _MAX_ROWS
        and half_in % 128 == 0
        and n_out % 128 == 0
        and _block_out(n_out, half_in) > 0
    )


def _kernel(x_ref, w_ref, s_ref, o_ref, *, half_in: int):
    w = w_ref[:].astype(jnp.int32)  # [bo, I/2] sign-extended bytes
    lo = ((w << 28) >> 28).astype(x_ref.dtype)  # low nibble, sign-extended
    hi = (w >> 4).astype(x_ref.dtype)  # high nibble (arith shift)
    acc = jax.lax.dot_general(
        x_ref[:, :half_in], lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        x_ref[:, half_in:], hi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def int4_matvec(
    x: jnp.ndarray,  # [R, I] activations (bf16/f32), R small
    w_p: jnp.ndarray,  # [O, I/2] packed nibbles (halves layout)
    scale: jnp.ndarray,  # [O] f32 per-output-channel scales
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # [R, O] in x.dtype
    rows, n_in = x.shape
    n_out, half_in = w_p.shape
    assert n_in == 2 * half_in, (x.shape, w_p.shape)
    bo = _block_out(n_out, half_in)
    assert bo, (n_out, half_in)
    kernel = functools.partial(_kernel, half_in=half_in)
    return pl.pallas_call(
        kernel,
        grid=(n_out // bo,),
        in_specs=[
            pl.BlockSpec((rows, n_in), lambda o: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, half_in), lambda o: (o, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda o: (0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, bo), lambda o: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n_out), x.dtype),
        interpret=interpret,
    )(x, w_p, scale.astype(jnp.float32).reshape(1, n_out))
