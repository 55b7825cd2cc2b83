"""SVGD driver.

TPU-native redesign of the reference SVGD class (reference:
include/SVGDCpp/SVGD.hpp). The construction/validation surface, options
struct, Initialize/Run lifecycle, bounds clamping, parameter hot-swap and
intermediate-matrix logging all mirror the reference; the execution model
does not: instead of a Python/C++ loop around per-pair tape evaluations, the
whole iteration — bandwidth adaptation, scores, phi, optimizer, clamp —
compiles into ONE ``lax.scan`` under ``jit``, so a full Run() is a single
device program.

The reference's ``Parallel`` flag (OpenMP threads + per-thread kernel tape
clones, SVGD.hpp:239-249) has no analog: the TPU path is always data
parallel over particles, and multi-chip scaling is provided by ``mesh``
sharding instead (see svgdcpp_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .core.exceptions import DimensionMismatchError, SVGD_LOG_PREFIX
from .core.types import ParticleStore, as_store
from .kernels.algebra import flatten_rbf_terms
from .kernels.gaussian_rbf import GaussianRBFKernel, rbf_kernel_fn
from .kernels.kernel import Kernel
from .models.model import Model
from .optimizers.base import Optimizer
from .ops.phi import (
    kernel_matrix_and_grad,
    phi_generic,
    phi_rbf,
    phi_rbf_blocked,
    phi_rbf_terms,
)
from .utils.logging import write_intermediate_matrices

#: Above this particle count the dense n x n phi switches to the
#: tile-streamed implementation (which also uses the cancellation-free
#: difference form for small m — see ops/phi.py).
DENSE_PHI_MAX_PARTICLES = 1024

#: On a real TPU backend, auto prefers the fused lag-1 Mosaic sweep over
#: the dense exact-median path already above THIS count (measured d=2:
#: 10.6M vs 1.5M updates/s at n=512, 21.2M vs 12.3M at n=1024; BLR d=50:
#: 14.8M vs 9.1M at n=1000 — docs/perf.md). Below it the exact same-step
#: median (strict reference parity) is kept; phi_impl='dense' keeps it at
#: any n.
TPU_FUSED_MIN_PARTICLES = 256


@dataclasses.dataclass
class SVGDOptions:
    """Options struct (reference SVGDOptions, SVGD.hpp:27-52).

    ``lower_bound=None`` / ``upper_bound=None`` disable bound checking — the
    reference's +/-inf sentinel (SVGD.hpp:41-43, 184-190).
    """

    dimension: int = 0
    num_iterations: int = 0
    coordinate_matrix: Any = None  # (n, m) array or ParticleStore
    kernel: Optional[Kernel] = None
    model: Optional[Model] = None
    optimizer: Optional[Optimizer] = None
    lower_bound: Any = None
    upper_bound: Any = None
    intermediate_matrices_output_path: str = "log.txt"
    parallel: bool = True  # accepted for parity; TPU path is always parallel
    log_intermediate_matrices: bool = False
    # --- TPU-native extensions ---
    phi_impl: str = "auto"  # 'auto' | 'dense' | 'blocked' | 'pallas' | 'generic'
    row_tile: int = 1024
    mesh: Any = None  # jax.sharding.Mesh to shard the particle axis over
    #: Annealed SVGD: per-iteration temperature tau scaling the scores
    #: (phi uses tau * grad log p). Either a (num_iterations,) array or a
    #: callable iteration -> tau (traced; use jnp ops). None = no annealing.
    annealing: Any = None
    #: Record cheap per-step statistics (phi RMS, max step size, bandwidth)
    #: during run(); available afterwards as ``svgd.stats`` (stacked arrays).
    track_stats: bool = False
    #: Median-selection bins per fused sweep (phi_impl='fused'/'fused_terms').
    #: Each pair pays fused_bins+1 threshold compares, so fewer bins = faster
    #: sweeps (measured at N=10k on v5e under the round-3 Mosaic kernel:
    #: 2 -> 22.8M, 3 -> 18.3M, 4 -> 16.6M updates/s) at coarser per-pass
    #: bracket refinement. The steady-state bracket width is
    #: ~4*disp*bins/(bins-1), so the median estimate error is bounded by
    #: half that, ~2*disp*bins/(bins-1) — at the default 2 that is 4x the
    #: max per-step displacement, the same class as the lag-1 scale's own
    #: 2*disp movement error (posterior moment errors measured
    #: indistinguishable from bins=3,
    #: docs/perf.md). The count-verified bracket check + in-graph bisection
    #: fallback hold for any value.
    fused_bins: int = 2
    #: MXU operand dtype for the single-term Mosaic fused sweep
    #: ('fused_pallas' only): 'float32' (default) or 'bfloat16'
    #: (experimental — halves MXU operand width at ~2^-8 per-pair relative
    #: rounding; accumulation and the exp stay f32. See docs/perf.md).
    fused_dot_dtype: str = "float32"
    #: Symmetric (upper-triangle) sweep selection for the Mosaic fused
    #: paths, INCLUDING the SVGDOptions.mesh schedule: None (default)
    #: auto-selects the triangle form whenever eligible; False forces the
    #: ordered cross/square sweep without touching numerics (the escape
    #: hatch fused_dot_dtype is not); True forces the full-width triangle
    #: form where the shape supports it (advisory — ineligible shapes
    #: still fall back).
    fused_sym: Any = None


def _prepare_bound(bound, dimension, name) -> Optional[jnp.ndarray]:
    """Validate/broadcast a bound to shape (m,) (reference SVGD.hpp:193-216)."""
    if bound is None:
        return None
    b = jnp.reshape(jnp.asarray(bound, jnp.result_type(float)), (-1,))
    if b.shape[0] == 1:
        b = jnp.broadcast_to(b, (dimension,))
    elif b.shape[0] != dimension:
        raise DimensionMismatchError(
            f"The provided {name} bounds have incorrect dimensions."
        )
    return b


class SVGD:
    """Main driver (reference SVGD class, SVGD.hpp:84-511)."""

    def __init__(self, *args, **kwargs):
        # Ctor parity: SVGD(options) or
        # SVGD(dim, iter, coords, kernel, model, optimizer, [lower, upper, ...])
        # (reference SVGD.hpp:93-250).
        if len(args) == 1 and isinstance(args[0], SVGDOptions) and not kwargs:
            opts = args[0]
        else:
            names = [
                "dimension",
                "num_iterations",
                "coordinate_matrix",
                "kernel",
                "model",
                "optimizer",
                "lower_bound",
                "upper_bound",
                "parallel",
                "log_intermediate_matrices",
                "intermediate_matrices_output_path",
            ]
            if len(args) > len(names):
                raise TypeError(
                    f"SVGD() takes at most {len(names)} positional arguments "
                    f"({len(args)} given)"
                )
            merged = dict(zip(names, args))
            dup = set(merged) & set(kwargs)
            if dup:
                raise TypeError(
                    "SVGD() got multiple values for argument(s): "
                    + ", ".join(sorted(dup))
                )
            merged.update(kwargs)
            opts = SVGDOptions(**merged)

        self.options = opts
        self.store: ParticleStore = as_store(opts.coordinate_matrix)
        self.dimension = self.store.dimension
        self.num_particles = self.store.num_particles
        self.num_iterations = int(opts.num_iterations)

        # Dimension check (reference SVGD.hpp:169-173).
        if self.dimension != int(opts.dimension):
            raise DimensionMismatchError(
                "Specified dimension does not match the particle coordinate matrix."
            )

        # Null-component validation (reference SVGD.hpp:223-236).
        if opts.kernel is None:
            raise ValueError(SVGD_LOG_PREFIX + "[Argument Error] Invalid Kernel object.")
        if opts.model is None:
            raise ValueError(SVGD_LOG_PREFIX + "[Argument Error] Invalid Model object.")
        if opts.optimizer is None:
            raise ValueError(
                SVGD_LOG_PREFIX + "[Argument Error] Invalid Optimizer object."
            )
        self.kernel: Kernel = opts.kernel
        self.model: Model = opts.model
        self.optimizer: Optimizer = opts.optimizer

        # Share the particle store with the kernel — the reference's
        # shared-pointer contract (SVGD.hpp:176, GaussianRBFKernel.hpp:52):
        # the kernel sees updated particle positions without explicit data
        # flow.
        if hasattr(self.kernel, "store"):
            self.kernel.store = self.store

        self.lower_bound = _prepare_bound(opts.lower_bound, self.dimension, "lower")
        self.upper_bound = _prepare_bound(opts.upper_bound, self.dimension, "upper")
        self.check_bounds = self.lower_bound is not None or self.upper_bound is not None
        if self.check_bounds:
            print(SVGD_LOG_PREFIX + "Bound checking enabled.")

        self.log_intermediate_matrices = bool(opts.log_intermediate_matrices)
        self.intermediate_matrices_output_path = opts.intermediate_matrices_output_path
        self.mesh = opts.mesh
        self._initialized = False

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------
    def initialize(self):
        """Initialize components and compile the step (reference SVGD.hpp:268-296)."""
        self.model.initialize()
        self.kernel.initialize()
        coords = self.store.value
        self._opt_state = self.optimizer.init(coords.dtype)
        # Full-reset lifecycle (reference re-Initialize): the annealing
        # iteration restarts and the warm/lag-1 median brackets are
        # re-seeded from the CURRENT coordinates — a stale bracket from a
        # previous run would silently feed the first fused step's phi.
        self._iteration = 0
        self._scale_aux = None
        self._select_impl()
        self._build_step()
        self._intermediate_logs = None
        self._initialized = True
        return self

    def _select_impl(self):
        opts = self.options
        self._is_rbf = (
            isinstance(self.kernel, GaussianRBFKernel)
            and self.kernel._kernel_fn is rbf_kernel_fn
        )
        # (slot_index, owning kernel) pairs whose inverse-scale parameter is
        # recomputed in-graph each step (incl. composed kernels' RBF slots).
        self._adaptive_slots = self.kernel.adaptive_slots()
        # Algebraic flattening of `+ - * /` trees of pure RBF kernels
        # (kernels/algebra.py): closed-form phi instead of the generic VJP.
        self._rbf_terms = (
            None if self._is_rbf else flatten_rbf_terms(self.kernel)
        )
        self._refresh_psd()
        impl = opts.phi_impl
        if self.log_intermediate_matrices:
            # The debug dump needs the explicit K / grad-K stacks, which only
            # the generic path materializes (reference logs them too,
            # SVGD.hpp:346-358).
            impl = "generic"
        elif impl == "auto":
            # TPU prefers the fused Mosaic sweep from a much smaller n
            # (see TPU_FUSED_MIN_PARTICLES); other backends keep the dense
            # exact-median path up to DENSE_PHI_MAX_PARTICLES.
            fused_threshold = (
                TPU_FUSED_MIN_PARTICLES
                if jax.default_backend() == "tpu" and self._mesh_pallas_ok()
                else DENSE_PHI_MAX_PARTICLES
            )
            if self._rbf_terms is not None:
                from .kernels.algebra import (
                    fused_terms_eligible,
                    fused_terms_statically_positive,
                )

                eligible = fused_terms_eligible(
                    self._rbf_terms, self._adaptive_slots,
                    self.kernel.parameters,
                )
                # Mosaic terms sweep: ONE shared -sq VMEM tile for all
                # terms + in-sweep median counts (same reasoning as
                # 'fused_pallas'). Requires every effective gamma provably
                # positive (padded-row decay) and — under SVGDOptions.mesh,
                # where the sweep runs in an internal shard_map because
                # GSPMD cannot partition a pallas_call — an even particle
                # split over the devices.
                mosaic = (
                    eligible
                    and jax.default_backend() == "tpu"
                    and self._mesh_pallas_ok()
                    and fused_terms_statically_positive(
                        self._rbf_terms, self._adaptive_slots,
                        self.kernel.parameters,
                    )
                )
                # The lowered TPU threshold is justified ONLY by Mosaic
                # measurements (docs/perf.md); when the fallback would be
                # the XLA fused_terms sweep (e.g. division terms), keep the
                # original threshold so small-n composed kernels keep the
                # exact same-step median of 'rbf_terms'.
                terms_threshold = (
                    fused_threshold if mosaic else DENSE_PHI_MAX_PARTICLES
                )
                if self.num_particles > terms_threshold and eligible:
                    impl = "fused_terms_pallas" if mosaic else "fused_terms"
                elif self._aniso_terms_auto_ok():
                    # Anisotropic constant slots: the triangle Mosaic sweep
                    # keeps the composition fused (per-term P-space
                    # quadratic-form tiles; VERDICT r3 measured the
                    # 'rbf_terms' fallback at 4.4M vs 9.2M+ fused).
                    impl = "fused_aniso_terms_pallas"
                else:
                    impl = "rbf_terms"
            elif not self._is_rbf:
                impl = "generic"
            elif (
                getattr(self.kernel, "scale_method", None)
                == GaussianRBFKernel.ScaleMethod.MEDIAN
                and self.num_particles > fused_threshold
            ):
                # Median-adaptive at scale: ONE fused O(n^2) sweep per step
                # (phi contraction + next step's median counts) instead of
                # separate count and phi sweeps. On a real TPU the Mosaic
                # kernel wins: it keeps the squared-distance tile in VMEM
                # where XLA's fusion splits the tile body into several
                # kernels with an HBM round-trip (measured 10.15M vs 9.61M
                # updates/s at N=10k, docs/perf.md); on CPU the Pallas
                # interpreter would be far slower, so keep the XLA sweep.
                # Under SVGDOptions.mesh the sweep runs inside an internal
                # shard_map (GSPMD cannot partition a pallas_call), so the
                # Mosaic win is kept on a mesh too when the particle count
                # divides evenly over the devices.
                impl = (
                    "fused_pallas"
                    if jax.default_backend() == "tpu"
                    and self._mesh_pallas_ok()
                    else "fused"
                )
            elif self.num_particles <= DENSE_PHI_MAX_PARTICLES:
                impl = "dense"
            else:
                impl = "blocked"
        if impl in (
            "dense", "blocked", "pallas", "fused", "fused_pallas"
        ) and not self._is_rbf:
            raise ValueError(
                f"phi_impl={impl!r} requires an uncomposed GaussianRBFKernel."
            )
        if (
            impl in ("rbf_terms", "fused_terms", "fused_terms_pallas",
                     "fused_aniso_terms_pallas")
            and self._rbf_terms is None
        ):
            raise ValueError(
                f"phi_impl={impl!r} requires a `+ - * /` composition of "
                "pure GaussianRBFKernels (see kernels/algebra.py)."
            )
        if impl in ("fused_terms", "fused_terms_pallas"):
            from .kernels.algebra import (
                fused_terms_eligible,
                fused_terms_statically_positive,
            )

            if not fused_terms_eligible(
                self._rbf_terms, self._adaptive_slots, self.kernel.parameters
            ):
                raise ValueError(
                    f"phi_impl={impl!r} requires every adaptive slot to "
                    "be median-scaled and every constant slot isotropic "
                    "(gamma * I); use 'rbf_terms' for the general case."
                )
            if impl == "fused_terms_pallas" and not (
                fused_terms_statically_positive(
                    self._rbf_terms, self._adaptive_slots,
                    self.kernel.parameters,
                )
            ):
                raise ValueError(
                    "phi_impl='fused_terms_pallas' requires every effective "
                    "term gamma to be provably positive (no division terms, "
                    "positive constant scales); use 'fused_terms'."
                )
        if impl == "fused_aniso_terms_pallas":
            from .kernels.algebra import fused_aniso_terms_supported

            # (self._rbf_terms is None already rejected above with the
            # shared composition-required message.)
            if not fused_aniso_terms_supported(
                self._rbf_terms, self._adaptive_slots, self.kernel.parameters
            ):
                raise ValueError(
                    "phi_impl='fused_aniso_terms_pallas' requires "
                    "median-scaled adaptive slots, no division terms, and "
                    "every term's effective precision positive definite; "
                    "use 'rbf_terms' for the general case."
                )
            if self.options.mesh is not None:
                raise ValueError(
                    "phi_impl='fused_aniso_terms_pallas' does not support "
                    "SVGDOptions.mesh (the triangle sweep is single-device);"
                    " use 'rbf_terms' under a mesh."
                )
        if impl in ("fused", "fused_pallas") and (
            getattr(self.kernel, "scale_method", None)
            != GaussianRBFKernel.ScaleMethod.MEDIAN
        ):
            raise ValueError(
                "phi_impl='fused' requires ScaleMethod.MEDIAN (the fused "
                "sweep produces median-selection counts)."
            )
        if self.options.mesh is not None and impl in (
            "pallas", "fused_pallas", "fused_terms_pallas"
        ):
            # Explicitly requested Mosaic under a mesh: the sweep runs
            # inside an internal shard_map over the mesh's first axis
            # (GSPMD cannot partition a pallas_call) — which requires a
            # real TPU backend (the pallas interpreter's grid loop cannot
            # carry shard_map VMA types) and an even particle split.
            if impl == "pallas":
                raise ValueError(
                    "phi_impl='pallas' does not support SVGDOptions.mesh; "
                    "use 'fused_pallas' (sharded via an internal shard_map) "
                    "or 'blocked'."
                )
            if jax.default_backend() != "tpu":
                raise ValueError(
                    f"phi_impl={impl!r} with SVGDOptions.mesh requires a "
                    "TPU backend; use 'fused'/'fused_terms' (or "
                    "phi_impl='auto') on other backends."
                )
            if not self._mesh_pallas_ok():
                mesh = self.options.mesh
                axis = mesh.axis_names[0]
                raise ValueError(
                    f"phi_impl={impl!r} with SVGDOptions.mesh requires "
                    f"num_particles ({self.num_particles}) to divide evenly "
                    f"over the {mesh.shape[axis]} devices of mesh axis "
                    f"{axis!r} (the axis the internal shard_map shards "
                    "over); use 'fused'/'fused_terms' (GSPMD partitions "
                    "them for any n). Do NOT pad the particle set with "
                    "duplicates — padded rows would bias phi and the "
                    "n^2 median (docs/instructions.md)."
                )
        self._phi_impl = impl

    def _mesh_pallas_ok(self) -> bool:
        """Whether the Mosaic fused sweep can run under SVGDOptions.mesh:
        the internal shard_map shards rows over the mesh's FIRST axis, so
        the particle count must split evenly over that axis's size (not
        the total device count — a multi-axis mesh only row-shards on
        axis 0). (No mesh -> trivially ok.)"""
        mesh = self.options.mesh
        return (
            mesh is None
            or self.num_particles % mesh.shape[mesh.axis_names[0]] == 0
        )

    def _aniso_terms_auto_ok(self) -> bool:
        """Auto-selection gate for the anisotropic fused Mosaic sweep:
        supported composition, real TPU, no mesh (the triangle sweep is
        single-device), and n/VMEM within the triangle's budget."""
        import jax as _jax

        from .kernels.algebra import (
            fused_aniso_terms_supported,
            split_iso_aniso_terms,
        )
        from .ops.pallas_phi import aniso_sym_eligible

        if self._rbf_terms is None or self.options.mesh is not None:
            return False
        if _jax.default_backend() != "tpu":
            return False
        if not fused_aniso_terms_supported(
            self._rbf_terms, self._adaptive_slots, self.kernel.parameters
        ):
            return False
        iso_idx, aniso_idx = split_iso_aniso_terms(
            self._rbf_terms, self._adaptive_slots, self.kernel.parameters
        )
        if not aniso_idx:
            return False  # all-isotropic compositions use the shared-sq path
        return aniso_sym_eligible(
            self.num_particles, self.dimension, len(aniso_idx), bool(iso_idx)
        )

    def _refresh_psd(self):
        """PSD-ness of the quadratic forms the closed-form paths clamp.

        MEDIAN scales are PSD by construction; HESSIAN scales may be
        indefinite (non-log-concave models) so the clamp-at-zero noise
        guard must be skipped; constant matrices are eigenvalue-checked on
        their current values (re-run on parameter hot-swap).
        """
        from .kernels.algebra import term_psd_flags

        if self._rbf_terms is not None:
            self._term_psd = term_psd_flags(
                self._rbf_terms, self._adaptive_slots, self.kernel.parameters
            )
        else:
            self._term_psd = None
        if self._is_rbf:
            method = self.kernel.scale_method
            if method == GaussianRBFKernel.ScaleMethod.MEDIAN:
                self._rbf_psd = True
            elif method == GaussianRBFKernel.ScaleMethod.HESSIAN:
                self._rbf_psd = False
            else:
                from .kernels.algebra import matrix_is_psd

                self._rbf_psd = matrix_is_psd(self.kernel.parameters[0])
        else:
            self._rbf_psd = True

    # Hooks: a custom (user-overridden) per-step hook cannot run inside the
    # jitted scan; fall back to an eager per-iteration loop, mirroring the
    # reference's hook-then-phi step order (SVGD.hpp:373-400).
    @staticmethod
    def _hook_override(obj, base_fns):
        """Return the overridden hook callable, honoring BOTH the snake_case
        ``step`` and the advertised CamelCase ``Step`` spelling (a subclass
        may override either; the class-level aliases bind the base function,
        so each attribute must be checked independently)."""
        cls = type(obj)
        if getattr(cls, "Step", None) not in base_fns:
            return obj.Step
        if getattr(cls, "step", None) not in base_fns:
            return obj.step
        return None

    _MODEL_BASE_HOOKS = (Model.step, Model.Step)
    _KERNEL_BASE_HOOKS = (
        Kernel.step,
        Kernel.Step,
        GaussianRBFKernel.step,
        GaussianRBFKernel.Step,
    )

    def _has_custom_hooks(self) -> bool:
        return (
            self._hook_override(self.model, self._MODEL_BASE_HOOKS) is not None
            or self._hook_override(self.kernel, self._KERNEL_BASE_HOOKS)
            is not None
        )

    # ------------------------------------------------------------------
    # Pure step construction
    # ------------------------------------------------------------------
    def _phi(self, coords, scores, kparams):
        if self._phi_impl == "generic":
            return phi_generic(
                coords, scores, self.kernel.kernel_pure, kparams,
                self.options.row_tile,
            )
        if self._phi_impl == "rbf_terms":
            return phi_rbf_terms(
                coords, scores, kparams, self._rbf_terms,
                self.options.row_tile, psd_flags=self._term_psd,
            )
        if self._phi_impl == "dense":
            return phi_rbf(coords, scores, kparams[0], psd=self._rbf_psd)
        if self._phi_impl == "blocked":
            return phi_rbf_blocked(
                coords, scores, kparams[0], self.options.row_tile,
                psd=self._rbf_psd,
            )
        if self._phi_impl == "pallas":
            from .ops.pallas_phi import phi_rbf_pallas

            return phi_rbf_pallas(coords, scores, kparams[0], psd=self._rbf_psd)
        raise ValueError(f"unknown phi_impl {self._phi_impl!r}")

    def _scale_params(self, coords, mparams, kparams, scale_aux, slot_mparams):
        """In-graph bandwidth adaptation (reference kernel Step(),
        GaussianRBFKernel.hpp:141-156), generalized to composed kernels:
        each adaptive slot is refilled from its owning kernel's pure scale
        function. ``scale_aux`` threads per-slot warm-start state (previous
        median bracket) through the scan; ``slot_mparams`` threads each
        slot's FOREIGN owning-model parameters (a Hessian slot may target a
        model other than the driver's — reference GaussianRBFKernel.hpp:52
        lets any kernel hold any model) so a later update_parameters on that
        model takes effect without a rebuild."""
        if not self._adaptive_slots:
            return kparams, scale_aux
        kparams = list(kparams)
        new_aux = list(scale_aux)
        for i, (idx, owner) in enumerate(self._adaptive_slots):
            if owner.target_model is self.model:
                mp = mparams
            else:
                mp = slot_mparams[i]  # None when the slot has no model
            if scale_aux[i] is not None and hasattr(owner, "compute_scale_with_aux"):
                kparams[idx], new_aux[i] = owner.compute_scale_with_aux(
                    coords, mp, scale_aux[i]
                )
            elif mp is not None:
                kparams[idx] = owner.compute_scale_pure(coords, mp)
            else:
                kparams[idx] = owner.compute_scale_pure(coords)
        return tuple(kparams), tuple(new_aux)

    def _mosaic_sweep_mesh(self, coords, scores, thresholds, *, gamma=None,
                           gammas=None, signs=None):
        """Fused Mosaic sweep under ``SVGDOptions.mesh``: an internal
        shard_map over the mesh's first axis gathers the global
        sources/scores per device, runs the per-device VMEM-resident cross
        kernel (ops/pallas_phi) and psums the row-band selection counts —
        the same schedule ShardedSVGD compiles, whose cross-shard math is
        proven by tests/test_pallas.py::test_fused_pallas_shard_decomposition.
        GSPMD alone cannot partition a pallas_call, so without this wrapper
        a mesh silently lost the Mosaic win (up to 1.66x at N=300k,
        docs/perf.md)."""
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        axis = mesh.axis_names[0]
        dd = self.options.fused_dot_dtype

        from .ops.pallas_phi import sym_panel_sharded_plan, sym_sharded_plan

        # Chunk by the size of mesh AXIS 0 — the only axis consuming pair
        # chunks (multi-axis meshes only row-shard on axis 0).
        n_glob = int(coords.shape[0])
        sym_ok = dd == "float32" and self.options.fused_sym is not False
        sym_plan = (
            sym_sharded_plan(n_glob, self.dimension, int(mesh.shape[axis]))
            if sym_ok
            else None
        )
        panel_plan = (
            sym_panel_sharded_plan(
                n_glob, self.dimension, int(mesh.shape[axis])
            )
            if sym_ok and sym_plan is None and gammas is None
            else None
        )
        if panel_plan is not None:
            # Past the full-width accumulator budget: the chunked
            # panel-rotated triangle (round 5) keeps the halved per-pair
            # work on the mesh instead of falling back to the cross sweep.
            from .ops.pallas_phi import sym_panel_sharded_phi

            pi_np, pj_np, sym_nb, sym_w, _n_pad, sym_per = panel_plan
            sym_pi = jnp.asarray(pi_np)
            sym_pj = jnp.asarray(pj_np)

            def local(c_l, s_l, g, thr):
                sources = jax.lax.all_gather(c_l, axis, tiled=True)
                scores_g = jax.lax.all_gather(s_l, axis, tiled=True)
                return sym_panel_sharded_phi(
                    c_l, s_l, sources, scores_g, axis, sym_pi, sym_pj,
                    sym_per, sym_nb, sym_w, thr, gamma=g,
                )

            args = (coords, scores, gamma, thresholds)
        elif sym_plan is not None:
            # Symmetric distributed sweep: the global triangle's
            # super-tile list splits across devices (each unordered pair
            # once) + one accumulator psum — the ShardedSVGD fused_sym
            # schedule on the GSPMD convenience path (shared definition:
            # ops/pallas_phi.sym_sharded_phi).
            from .ops.pallas_phi import sym_sharded_phi

            pi_np, pj_np, sym_n_pad, sym_per = sym_plan
            sym_pi = jnp.asarray(pi_np)
            sym_pj = jnp.asarray(pj_np)

            if gammas is None:

                def local(c_l, s_l, g, thr):
                    sources = jax.lax.all_gather(c_l, axis, tiled=True)
                    scores_g = jax.lax.all_gather(s_l, axis, tiled=True)
                    return sym_sharded_phi(
                        c_l, s_l, sources, scores_g, axis, sym_pi, sym_pj,
                        sym_per, sym_n_pad, thr, gamma=g,
                    )

                args = (coords, scores, gamma, thresholds)
            else:

                def local(c_l, s_l, gs, thr):
                    sources = jax.lax.all_gather(c_l, axis, tiled=True)
                    scores_g = jax.lax.all_gather(s_l, axis, tiled=True)
                    return sym_sharded_phi(
                        c_l, s_l, sources, scores_g, axis, sym_pi, sym_pj,
                        sym_per, sym_n_pad, thr, gammas=list(gs),
                        signs=signs,
                    )

                args = (coords, scores, tuple(gammas), thresholds)
        elif gammas is None:
            from .ops.pallas_phi import phi_rbf_fused_pallas_cross

            def local(c_l, s_l, g, thr):
                sources = jax.lax.all_gather(c_l, axis, tiled=True)
                scores_g = jax.lax.all_gather(s_l, axis, tiled=True)
                phi_l, counts_l = phi_rbf_fused_pallas_cross(
                    c_l, sources, scores_g, g, thr, dot_dtype=dd,
                    axis_name=axis,
                )
                return phi_l, jax.lax.psum(counts_l, axis)

            args = (coords, scores, gamma, thresholds)
        else:
            from .ops.pallas_phi import phi_rbf_terms_fused_pallas_cross

            def local(c_l, s_l, gs, thr):
                sources = jax.lax.all_gather(c_l, axis, tiled=True)
                scores_g = jax.lax.all_gather(s_l, axis, tiled=True)
                phi_l, counts_l = phi_rbf_terms_fused_pallas_cross(
                    c_l, sources, scores_g, gs, signs, thr,
                    axis_name=axis,
                )
                return phi_l, jax.lax.psum(counts_l, axis)

            args = (coords, scores, tuple(gammas), thresholds)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(), P()),
            out_specs=(P(axis, None), P()),
        )(*args)

    def build_step_fn(self):
        """Return the pure step: state -> (state, debug|None).

        state = {coords, opt_state, kernel_params, model_params}. This is the
        function the scan rolls; it is also the graft/bench entry surface.
        """
        collect_debug = self.log_intermediate_matrices

        annealing = self.options.annealing
        if annealing is not None and not callable(annealing):
            annealing_arr = jnp.asarray(annealing)
            annealing = lambda it: annealing_arr[
                jnp.clip(it, 0, annealing_arr.shape[0] - 1)
            ]

        fused = self._phi_impl in (
            "fused", "fused_pallas", "fused_terms", "fused_terms_pallas",
            "fused_aniso_terms_pallas",
        )
        fused_pallas = self._phi_impl == "fused_pallas"
        fused_terms = self._phi_impl in (
            "fused_terms", "fused_terms_pallas", "fused_aniso_terms_pallas"
        )
        fused_terms_pallas = self._phi_impl == "fused_terms_pallas"
        fused_aniso = self._phi_impl == "fused_aniso_terms_pallas"
        fused_bins = int(self.options.fused_bins)
        if fused_terms:
            median_slot_idx = [idx for idx, _ in self._adaptive_slots]
            term_signs = [s for s, _ in self._rbf_terms]
        if fused_aniso:
            from .kernels.algebra import split_iso_aniso_terms

            iso_idx, aniso_idx = split_iso_aniso_terms(
                self._rbf_terms, self._adaptive_slots, self.kernel.parameters
            )
            # trace-time routing constant; hot-swap rebuilds on change
            self._aniso_split = (iso_idx, aniso_idx)

        def step_fn(state, _=None):
            coords = state["coords"]
            mparams = state["model_params"]
            # Through grad_log_density_pure so a model's closed-form score
            # override is honored (reference virtual Evaluate* pattern).
            scores = jax.vmap(
                lambda x: self.model.grad_log_density_pure(x, mparams)
            )(coords)
            if annealing is not None:
                tau = annealing(state["iteration"])
                scores = scores * jnp.asarray(tau, scores.dtype)
            if fused:
                # ONE O(n^2) sweep: phi with the PREVIOUS step's verified
                # median (lag-1 — within the 2*disp movement bound of the
                # current median) + this step's selection counts.
                from .ops.median import (
                    fused_lag1_plan,
                    fused_median_from_counts,
                )
                from .ops.phi import phi_rbf_fused_counts

                n, m = coords.shape
                aux = state["scale_aux"][0]
                fdt = aux["med"].dtype
                gamma, sel = fused_lag1_plan(
                    aux, n, fused_bins, coords.dtype
                )
                thresholds = sel["edges"]
                if fused_terms:
                    # Refill every (median) adaptive slot with the lag-1
                    # scale; constant slots keep their state values
                    # (isotropy proven at init).
                    from .kernels.algebra import refill_median_slots

                    kparams, gammas = refill_median_slots(
                        state["kernel_params"], median_slot_idx, gamma, m,
                        coords.dtype, [p for _, p in self._rbf_terms],
                    )
                else:
                    kparams = (gamma * jnp.eye(m, dtype=coords.dtype),)
                if fused_aniso:
                    from .kernels.algebra import term_precision
                    from .ops.pallas_phi import (
                        phi_rbf_aniso_terms_fused_pallas,
                    )

                    phi, counts = phi_rbf_aniso_terms_fused_pallas(
                        coords, scores,
                        [gammas[i] for i in iso_idx],
                        [term_signs[i] for i in iso_idx],
                        [
                            term_precision(self._rbf_terms[i][1], kparams)
                            for i in aniso_idx
                        ],
                        [term_signs[i] for i in aniso_idx],
                        thresholds,
                    )
                elif fused_terms_pallas:
                    if self.mesh is not None:
                        phi, counts = self._mosaic_sweep_mesh(
                            coords, scores, thresholds,
                            gammas=gammas, signs=term_signs,
                        )
                    else:
                        from .ops.pallas_phi import phi_rbf_terms_fused_pallas

                        phi, counts = phi_rbf_terms_fused_pallas(
                            coords, scores, gammas, term_signs, thresholds,
                            sym=self.options.fused_sym,
                        )
                elif fused_terms:
                    from .ops.phi import phi_rbf_terms_fused_counts

                    phi, counts = phi_rbf_terms_fused_counts(
                        coords, scores, gammas, term_signs, thresholds,
                        self.options.row_tile,
                    )
                elif fused_pallas:
                    if self.mesh is not None:
                        phi, counts = self._mosaic_sweep_mesh(
                            coords, scores, thresholds, gamma=gamma
                        )
                    else:
                        from .ops.pallas_phi import phi_rbf_fused_pallas

                        phi, counts = phi_rbf_fused_pallas(
                            coords, scores, gamma, thresholds,
                            dot_dtype=self.options.fused_dot_dtype,
                            sym=self.options.fused_sym,
                        )
                else:
                    phi, counts = phi_rbf_fused_counts(
                        coords, scores, gamma, thresholds, self.options.row_tile
                    )
                from .ops.median import centered_count_env

                count_fn, hi0 = centered_count_env(
                    coords, row_tile=self.options.row_tile
                )
                med_new, lo1_n, hi1_n, lo2_n, hi2_n = fused_median_from_counts(
                    counts, sel, n * n, count_fn, hi0,
                    initialized=aux["hi1"] >= aux["lo1"],
                )
                scale_aux = (
                    {
                        "med": med_new.astype(fdt),
                        "lo1": lo1_n.astype(fdt),
                        "hi1": hi1_n.astype(fdt),
                        "lo2": lo2_n.astype(fdt),
                        "hi2": hi2_n.astype(fdt),
                        "disp": aux["disp"],
                    },
                )
            else:
                kparams, scale_aux = self._scale_params(
                    coords, mparams, state["kernel_params"], state["scale_aux"],
                    state["slot_model_params"],
                )
                phi = self._phi(coords, scores, kparams)
            # getattr: duck-typed user optimizers need not subclass Optimizer
            if getattr(self.optimizer, "needs_params", False):
                opt_state, inc = self.optimizer.step(
                    state["opt_state"], phi, coords
                )
            else:
                opt_state, inc = self.optimizer.step(state["opt_state"], phi)
            new_coords = coords + inc
            # Cast bounds to the coords dtype: under x64, f64 bounds would
            # otherwise promote an f32 carry and break the scan.
            if self.lower_bound is not None:
                new_coords = jnp.maximum(
                    new_coords, self.lower_bound.astype(new_coords.dtype)
                )
            if self.upper_bound is not None:
                new_coords = jnp.minimum(
                    new_coords, self.upper_bound.astype(new_coords.dtype)
                )
            if any(a is not None for a in scale_aux):
                # Max particle displacement of THIS update (bounds clamp
                # included) — next step's warm bracket expands by 2x this.
                disp = jnp.sqrt(
                    jnp.max(jnp.sum((new_coords - coords) ** 2, axis=1))
                )
                scale_aux = tuple(
                    {**a, "disp": disp.astype(a["disp"].dtype)}
                    if a is not None
                    else None
                    for a in scale_aux
                )
            new_state = {
                "coords": new_coords,
                "opt_state": opt_state,
                "kernel_params": kparams,
                "model_params": mparams,
                "scale_aux": scale_aux,
                "slot_model_params": state["slot_model_params"],
                "iteration": state["iteration"] + 1,
            }
            if collect_debug:
                k_mat, k_grad = kernel_matrix_and_grad(
                    coords, self.kernel.kernel_pure, kparams
                )
                debug = {
                    "log_model_grad": scores,
                    "kernel": k_mat,
                    "kernel_grad": k_grad,
                    "coords": new_coords,
                }
            elif self.options.track_stats:
                # The 'bandwidth' stat assumes an (m, m) inverse-scale in
                # slot 0; a custom kernel may carry no such parameter —
                # report NaN instead of failing at trace time.
                if kparams and getattr(kparams[0], "ndim", 0) == 2:
                    bandwidth = kparams[0][0, 0]
                else:
                    bandwidth = jnp.asarray(jnp.nan, coords.dtype)
                debug = {
                    "phi_rms": jnp.sqrt(jnp.mean(phi * phi)),
                    "step_max": jnp.max(
                        jnp.sqrt(jnp.sum((new_coords - coords) ** 2, axis=1))
                    ),
                    "bandwidth": bandwidth,
                }
            else:
                debug = 0.0  # scan needs a pytree output; keep it trivial
            return new_state, debug

        return step_fn

    def _build_step(self):
        step_fn = self.build_step_fn()
        self._jit_step = jax.jit(lambda s: step_fn(s)[0])
        self._jit_step_full = jax.jit(step_fn)  # keeps the debug output

        def run_n(state, num_steps):
            return jax.lax.scan(step_fn, state, None, length=num_steps)

        self._jit_run = jax.jit(run_n, static_argnums=1)

    def make_state(self):
        """Assemble the state pytree from current component parameters."""
        coords = self.store.value
        state = {
            "coords": coords,
            "opt_state": self._opt_state,
            # Kernel params (inverse-scale matrices) follow the coords dtype:
            # adaptive slots are REPLACED in-graph by values derived from
            # coords, and a dtype mismatch would break the scan carry.
            "kernel_params": tuple(
                jnp.asarray(p, coords.dtype) for p in self.kernel.parameters
            ),
            "model_params": tuple(self.model.parameters),
            # Foreign-model params per adaptive slot, read FRESH each
            # make_state so a hot-swap on a kernel's private target model is
            # honored by the next run (None for slots owned by self.model or
            # with no model at all).
            "slot_model_params": tuple(
                tuple(owner.target_model.parameters)
                if getattr(owner, "target_model", None) is not None
                and owner.target_model is not self.model
                else None
                for _, owner in self._adaptive_slots
            ),
            "scale_aux": self._current_scale_aux(coords),
            "iteration": jnp.asarray(getattr(self, "_iteration", 0), jnp.int32),
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import place_sharded

            axis = self.mesh.axis_names[0]
            sharding = NamedSharding(self.mesh, P(axis, None))
            replicated = NamedSharding(self.mesh, P())
            # place_sharded (not plain device_put): a multi-process mesh's
            # remote shards are not addressable. EVERY leaf gets an explicit
            # mesh sharding — replicated for the non-particle ones ONLY
            # (replicating the (n, m) arrays first would materialize a full
            # copy per device): leaves left on the default device would make
            # the input signature differ from the step's OUTPUT shardings,
            # so chaining a run's output back in would recompile once
            # (measured 2.6 s on the flagship shape).
            for key in (
                "kernel_params", "model_params", "slot_model_params",
                "scale_aux", "iteration",
            ):
                state[key] = jax.tree.map(
                    lambda x: place_sharded(jnp.asarray(x), replicated),
                    state[key],
                )
            state["coords"] = place_sharded(state["coords"], sharding)
            state["opt_state"] = jax.tree.map(
                lambda x, sharded_leaf: place_sharded(x, sharding)
                if sharded_leaf
                else place_sharded(jnp.asarray(x), replicated),
                state["opt_state"],
                self.optimizer.state_is_particle_sharded(state["opt_state"]),
            )
        return state

    def _current_scale_aux(self, coords):
        """Per-adaptive-slot warm-start aux (carried across run() calls)."""
        stored = getattr(self, "_scale_aux", None)
        if stored is not None:
            return stored
        if self._phi_impl in ("fused", "fused_pallas"):
            # {med, lo, hi, disp}: exact/hybrid median of the INITIAL
            # positions seeds the lag-1 fused pipeline.
            return (self.kernel.init_fused_aux(coords),)
        if self._phi_impl in ("fused_terms", "fused_terms_pallas",
                              "fused_aniso_terms_pallas"):
            # Composed kernel: same lag-1 seed as init_fused_aux, computed
            # at the root (only RBF leaves have init_fused_aux). Honor the
            # adaptive leaves' median_method — a leaf built with
            # median_method='exact' keeps the strict reference-parity seed
            # it would get on the uncomposed fused path.
            from .ops.median import fused_median_seed

            method = (
                self._adaptive_slots[0][1].median_method
                if self._adaptive_slots
                else "auto"
            )
            return (fused_median_seed(coords, method),)
        return tuple(
            owner.init_scale_aux(coords)
            if hasattr(owner, "init_scale_aux")
            else None
            for _, owner in self._adaptive_slots
        )

    def _absorb_state(self, state):
        self.store.value = state["coords"]
        self._opt_state = state["opt_state"]
        self._scale_aux = state["scale_aux"]
        self._iteration = int(state["iteration"])
        self.kernel.update_parameters(state["kernel_params"])

    # ------------------------------------------------------------------
    # Execution
    # ------------------------------------------------------------------
    def step(self):
        """Execute one SVGD step (reference SVGD::Step, SVGD.hpp:373-400)."""
        self._require_init()
        if self._has_custom_hooks():
            self._eager_hooks()
        state = self.make_state()
        self._absorb_state(self._jit_step(state))

    def run(self):
        """Execute num_iterations steps (reference SVGD::Run, SVGD.hpp:338-366)."""
        self._require_init()
        if self._has_custom_hooks():
            # Eager fallback: hooks are host-side Python, one jitted step per
            # iteration. Intermediate-matrix logging still collects per-step
            # snapshots like the reference (SVGD.hpp:346-366).
            debugs = []
            collect = self.log_intermediate_matrices or self.options.track_stats
            for _ in range(self.num_iterations):
                self._eager_hooks()
                state = self.make_state()
                new_state, debug = self._jit_step_full(state)
                self._absorb_state(new_state)
                if collect:
                    debugs.append(jax.tree.map(jax.device_get, debug))
            if collect and debugs:
                import numpy as np

                stacked = {
                    key: np.stack([np.asarray(d[key]) for d in debugs])
                    for key in debugs[0]
                }
                if self.log_intermediate_matrices:
                    self._intermediate_logs = stacked
                    write_intermediate_matrices(
                        self.intermediate_matrices_output_path, stacked
                    )
                else:
                    self.stats = stacked
        else:
            state = self.make_state()
            final_state, debug = self._jit_run(state, self.num_iterations)
            self._absorb_state(final_state)
            if self.log_intermediate_matrices:
                self._intermediate_logs = jax.tree.map(jax.device_get, debug)
                write_intermediate_matrices(
                    self.intermediate_matrices_output_path, self._intermediate_logs
                )
            elif self.options.track_stats:
                self.stats = jax.tree.map(jax.device_get, debug)
        return self.store.value

    def _eager_hooks(self):
        model_hook = self._hook_override(self.model, self._MODEL_BASE_HOOKS)
        if model_hook is not None:
            model_hook()
        kernel_hook = self._hook_override(self.kernel, self._KERNEL_BASE_HOOKS)
        if kernel_hook is not None:
            kernel_hook()

    def _require_init(self):
        if not self._initialized:
            raise RuntimeError(
                SVGD_LOG_PREFIX + "Initialize() must be called before stepping."
            )

    # ------------------------------------------------------------------
    # Parameter hot-swap (reference SVGD.hpp:304-332)
    # ------------------------------------------------------------------
    def update_kernel_parameters(self, params):
        if not getattr(self, "_initialized", False):
            # Pre-initialize hot-swap (reference allows it any time after
            # construction, SVGD.hpp:304-332): the impl/PSD flags don't
            # exist yet — initialize() derives them from the new values.
            self.kernel.update_parameters(params)
            self.kernel.initialize()
            return
        # Validate against the PROSPECTIVE values BEFORE mutating the
        # kernel (guarded swap, like MultivariateNormal.update_parameters):
        # a rejected swap must leave the running driver's parameters — and
        # the still-compiled step that reads them — untouched.
        from .kernels.kernel import _as_param_tuple

        new_params = _as_param_tuple(params)
        if self._phi_impl == "fused_aniso_terms_pallas":
            from .kernels.algebra import fused_aniso_terms_supported

            if not fused_aniso_terms_supported(
                self._rbf_terms, self._adaptive_slots, new_params
            ):
                # A non-PD effective term would invert the padded-row decay
                # (exp(+big) = inf) — reject the swap like the iso path.
                raise ValueError(
                    "phi_impl='fused_aniso_terms_pallas' requires every "
                    "term's effective precision to stay positive definite; "
                    "the swapped parameters violate that. Rebuild with "
                    "phi_impl='rbf_terms'."
                )
        if self._phi_impl in ("fused_terms", "fused_terms_pallas"):
            # The fused-terms sweep reads each constant slot as gamma =
            # P[0, 0] (isotropy was proven at initialize()); an anisotropic
            # swap would be silently truncated — reject it instead.
            from .kernels.algebra import (
                fused_terms_eligible,
                fused_terms_statically_positive,
            )

            if not fused_terms_eligible(
                self._rbf_terms, self._adaptive_slots, new_params
            ):
                raise ValueError(
                    "phi_impl='fused_terms' requires isotropic constant "
                    "slots; the swapped parameters are anisotropic. Rebuild "
                    "with phi_impl='rbf_terms' for anisotropic compositions."
                )
            if self._phi_impl == "fused_terms_pallas" and not (
                fused_terms_statically_positive(
                    self._rbf_terms, self._adaptive_slots, new_params
                )
            ):
                # A non-positive constant gamma would invert the Mosaic
                # kernel's padded-row decay into exp(+gamma*big) = inf.
                raise ValueError(
                    "phi_impl='fused_terms_pallas' requires every constant "
                    "slot gamma to stay positive; the swapped parameters "
                    "violate that. Rebuild with phi_impl='fused_terms'."
                )
        self.kernel.update_parameters(new_params)
        self.kernel.initialize()
        # Trace-time constants the compiled step bakes in: the iso/aniso
        # term routing and the PSD clamp flags. Re-derive both, then
        # rebuild AT MOST ONCE if either changed.
        rebuild = False
        if self._phi_impl == "fused_aniso_terms_pallas":
            from .kernels.algebra import split_iso_aniso_terms

            new_split = split_iso_aniso_terms(
                self._rbf_terms, self._adaptive_slots, self.kernel.parameters
            )
            if new_split != getattr(self, "_aniso_split", new_split):
                self._aniso_split = new_split
                rebuild = True
        before = (self._rbf_psd, self._term_psd)
        self._refresh_psd()
        if (self._rbf_psd, self._term_psd) != before:
            rebuild = True
        if rebuild:
            self._build_step()

    def update_model_parameters(self, params):
        self.model.update_parameters(params)
        self.model.initialize()

    # ------------------------------------------------------------------
    # CamelCase aliases
    # ------------------------------------------------------------------
    Initialize = initialize
    Run = run
    Step = step
    UpdateKernelParameters = update_kernel_parameters
    UpdateModelParameters = update_model_parameters
