from .pairwise import squared_pairwise_distances, weighted_quadratic_pairwise
from .median import (
    median_exact,
    pairwise_distance_median,
    pairwise_distance_median_exact,
    pairwise_distance_median_histogram,
    kth_smallest_hist,
    kth_smallest_bisect,
    count_le_cross,
    pairwise_distance_median_bisect,
)
from .phi import (
    phi_generic,
    phi_generic_cross,
    phi_rbf,
    phi_rbf_blocked,
    phi_rbf_cross,
    rbf_kernel_matrix,
)
from .ksd import ksd_rbf, ksd_squared_rbf
