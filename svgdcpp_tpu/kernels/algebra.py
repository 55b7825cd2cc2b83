"""Algebraic flattening of composed RBF kernel trees.

The reference composes kernels with `+ - * /` into an opaque function that
is then autodiffed per particle pair (reference Kernel.hpp:55-223 feeding
the per-pair loop SVGD.hpp:445-449). On TPU the generic path for such a
composition is the tile-streamed VJP (`ops/phi.phi_generic_cross`) — correct
for any kernel, but ~an order of magnitude more expensive than the
closed-form RBF contraction because each tile replays the composed kernel's
forward+backward instead of two MXU matmuls.

For trees whose leaves are all *pure Gaussian RBF* kernels the composition
never needs the generic path, because of two identities:

  * phi is LINEAR in k:   phi_{a*k1 + b*k2} = a*phi_{k1} + b*phi_{k2}
  * RBF products COLLAPSE: exp(-d^T P1 d) * exp(-d^T P2 d)
                             = exp(-d^T (P1+P2) d)      (same for /: P1-P2)

so any `+ - * /` tree flattens to a signed sum of RBF terms, each with an
effective precision matrix that is a signed sum of leaf parameter slots —
and each term's phi runs on the closed-form tile-streamed MXU path
(`ops/phi.phi_rbf_cross`). Per-step bandwidth adaptation keeps working
unchanged: the driver refills the adaptive slots in the flat parameter
tuple and the terms read the refreshed values.

A term is ``(sign, ((param_idx, psign), ...))`` representing

    sign * exp( - d^T ( sum_i psign * params[param_idx] ) d ).

``flatten_rbf_terms`` returns the term list, or ``None`` when the kernel is
not a pure-RBF arithmetic tree (custom leaf, non-single-term divisor, or a
term blow-up past ``MAX_RBF_TERMS`` from products of large sums).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

Term = Tuple[int, Tuple[Tuple[int, int], ...]]

# Products of sums multiply term counts; past this the generic VJP path is
# likely cheaper than many O(n^2) closed-form sweeps.
MAX_RBF_TERMS = 16


def flatten_rbf_terms(kernel, _offset: int = 0) -> Optional[List[Term]]:
    """Flatten a composed kernel into signed RBF terms, or None.

    ``_offset`` is the position of ``kernel``'s first parameter inside the
    ROOT kernel's concatenated parameter tuple (composition concatenates
    child parameters; reference Kernel.hpp:77-81).
    """
    from .gaussian_rbf import GaussianRBFKernel, rbf_kernel_fn

    info = getattr(kernel, "_compose_info", None)
    if info is None:
        # Leaf: must be a pure (un-overridden) Gaussian RBF with its single
        # inverse-scale parameter slot.
        if (
            isinstance(kernel, GaussianRBFKernel)
            and kernel._kernel_fn is rbf_kernel_fn
            and len(kernel.parameters) == 1
        ):
            return [(1, ((_offset, 1),))]
        return None

    op_name, left, right, n1 = info
    lt = flatten_rbf_terms(left, _offset)
    rt = flatten_rbf_terms(right, _offset + n1)
    if lt is None or rt is None:
        return None

    if op_name == "added":
        out = lt + rt
    elif op_name == "subtracted":
        out = lt + [(-s, p) for s, p in rt]
    elif op_name == "multiplied":
        # (sum_a) * (sum_b) distributes; each pair of RBF factors collapses
        # by adding precision matrices.
        out = [(sa * sb, pa + pb) for sa, pa in lt for sb, pb in rt]
    elif op_name == "divided":
        # Only a single-term positive divisor stays inside the RBF algebra:
        # 1/exp(-d^T P d) = exp(-d^T (-P) d).
        if len(rt) != 1 or rt[0][0] != 1:
            return None
        _, pdiv = rt[0]
        neg = tuple((idx, -ps) for idx, ps in pdiv)
        out = [(sa, pa + neg) for sa, pa in lt]
    else:  # pragma: no cover - future operators
        return None

    if len(out) > MAX_RBF_TERMS:
        return None
    return out


def term_is_psd(term: Term) -> bool:
    """True when the term's effective precision is a nonnegative combination
    of (PSD) leaf parameters — lets the phi tile pass clamp the quadratic
    form at zero as a numerical guard. Any negated slot (division) may make
    it indefinite, so the clamp must be skipped."""
    return all(ps > 0 for _, ps in term[1])
