"""Device-mesh sharding for multi-chip fits.

The reference has no distributed code of any kind (SURVEY.md §5.8); the scaling story
the TPU build adds is row-sharded data parallelism over an ICI mesh:

* rows of X (hence of the feature matrix W) are sharded across the ``data`` axis;
* the D×D-scale Gram reduction WᵀS²W becomes a sharded matmul whose partial sums XLA
  combines with one ``psum`` riding the ICI;
* the tiny 2M×2M eigh and γ-selection are replicated on every chip;
* per-row outputs (LOO residuals, leverage, std) come back row-sharded.

No hand-written collectives: shardings are declared on the jit boundary and GSPMD
inserts the all-reduces. A second ``feature`` mesh axis is available for the n×2M @
2M×2M contractions at very large D.
"""

import math
from typing import Any

import jax

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neo_ls_svm_tpu.models.primal import primal_fit, trim_per_row


def make_mesh(
    num_data: int | None = None,
    num_feature: int = 1,
    devices: Any = None,
) -> Mesh:
    """Create a ("data", "feature") mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    if num_data is None:
        num_data = len(devices) // num_feature
    device_grid = np.asarray(devices[: num_data * num_feature]).reshape(num_data, num_feature)
    return Mesh(device_grid, axis_names=("data", "feature"))


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    remainder = arr.shape[0] % multiple
    if remainder == 0:
        return arr
    pad = multiple - remainder
    pad_width = ((0, pad),) + ((0, 0),) * (arr.ndim - 1)
    return np.pad(arr, pad_width)


def sharded_primal_fit(
    mesh: Mesh,
    X: np.ndarray,
    M_map: np.ndarray,
    b_map: np.ndarray,
    y: np.ndarray,
    sample_weight: np.ndarray,
    gammas: np.ndarray,
    C_emb: np.ndarray | None = None,
    *,
    is_classifier: bool,
    gamma_chunk: int = 128,
    sweep_precision: "jax.lax.Precision | None" = None,
) -> dict[str, jax.Array]:
    """Run ``primal_fit`` with rows sharded over the mesh's ``data`` axis.

    Rows are zero-weight-padded to a multiple of the data-axis size (padding provably
    does not perturb the solution: padded rows carry s=0, and the c₀ normalisation uses
    the true row count). Per-row outputs are returned unpadded.
    """
    n = X.shape[0]
    num_data = mesh.shape["data"]
    X_p = _pad_rows(np.asarray(X), num_data)
    y_p = _pad_rows(np.asarray(y), num_data)
    s_p = _pad_rows(np.asarray(sample_weight), num_data)
    row_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    X_d = jax.device_put(X_p, NamedSharding(mesh, P("data", None)))
    y_d = jax.device_put(y_p, row_sharding)
    s_d = jax.device_put(s_p, row_sharding)
    M_d = jax.device_put(np.asarray(M_map), replicated)
    b_d = jax.device_put(np.asarray(b_map), replicated)
    g_d = jax.device_put(np.asarray(gammas), replicated)
    C_d = None if C_emb is None else jax.device_put(np.asarray(C_emb), replicated)
    result = primal_fit(
        X_d,
        M_d,
        b_d,
        y_d,
        s_d,
        g_d,
        C_d,
        is_classifier=is_classifier,
        gamma_chunk=gamma_chunk,
        num_samples=n,
        sweep_precision=sweep_precision,
    )
    return trim_per_row(result, n)


def required_padding(n: int, num_data: int) -> int:
    """Rows of zero-weight padding needed to align ``n`` to the data axis."""
    return (math.ceil(n / num_data) * num_data) - n
