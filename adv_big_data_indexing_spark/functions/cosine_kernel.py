"""The ONE blocked exact-cosine kernel behind both pairwise tiers
(code-review r9: the square form in operators/clustering.py and the
rectangular form in operators/dedup.py carried two hand-synced copies
of the same 2^53 exactness guard and block policy — a fix applied to
one copy would silently leave the other wrong).

Exactness contract: quantized components are small integers, so when
``dim * maxabs² < 2^53`` every float64 intermediate of the BLAS matmul
is a representable integer and the product-sum is bit-identical to the
int64 matmul it replaces — at dgemm speed instead of numpy's int64
scalar loop. Above the bound (pathological magnitudes) the kernel
falls back to int64 blocks. Normalization divides IN PLACE (the
chained ``(dot / a) / b`` form kept two extra block-sized temporaries
alive — ~3× the documented per-task budget) in the same op order, so
results carry the same correctly-rounded doubles as the oracles.
"""

from __future__ import annotations


def cosine_blocks_exact(a_mat, a_sqrt, b_mat, b_sqrt, block_elems: int):
    """Yield ``(i0, i1, cos)`` — cosines of ``a_mat`` rows [i0, i1)
    against every ``b_mat`` row — in row blocks of ``block_elems``
    float64s. Pass ``a_mat is b_mat`` for the square (within-cluster
    pairwise) case; peak per-task memory is one block (~8·block_elems
    bytes) plus the operand matrices."""
    import numpy as np  # noqa: PLC0415

    n_b, dim = b_mat.shape
    blk = max(1, block_elems // max(n_b, 1))
    maxabs = 0.0
    if len(a_mat) and n_b:
        maxabs = max(float(np.abs(a_mat).max()), float(np.abs(b_mat).max()))
    exact64 = dim * maxabs * maxabs < 2.0**53
    bT = b_mat.T.astype(np.float64) if exact64 else None
    for i0 in range(0, a_mat.shape[0], blk):
        i1 = min(a_mat.shape[0], i0 + blk)
        if exact64:
            dot = a_mat[i0:i1].astype(np.float64) @ bT
        else:
            dot = (a_mat[i0:i1] @ b_mat.T).astype(np.float64)
        dot /= a_sqrt[i0:i1, None]
        dot /= b_sqrt[None, :]
        yield i0, i1, dot
