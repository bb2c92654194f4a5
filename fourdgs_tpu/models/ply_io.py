"""PLY import/export of trained gaussian clouds.

The reference calls `load_ply` but never defines it (`scene/__init__.py:86`
references a method missing from GaussianModel — checkpoints there are
.pth only). Here the round-trip is complete, using the standard 3DGS
attribute layout (x y z [t] nx ny nz f_dc_* f_rest_* opacity scale_*
[scale_t] rot_* [rot_r_*]) so static 3DGS viewers can open gaussian_dim=3
exports, extended with the 4D fields when present.
"""

from __future__ import annotations

import numpy as np

from .gaussians import (GaussianParams, GaussianState, AdamState,
                        empty_params, capacity_for)


def export_gaussians_ply(path: str, state: GaussianState,
                         gaussian_dim: int = 4, rot_4d: bool = True) -> None:
    n = int(state.n_active)
    p = state.params
    cols = [("x", np.asarray(p.xyz[:n, 0])),
            ("y", np.asarray(p.xyz[:n, 1])),
            ("z", np.asarray(p.xyz[:n, 2]))]
    if gaussian_dim == 4:
        cols.append(("t", np.asarray(p.t[:n, 0])))
    for axis in "xyz":
        cols.append((f"n{axis}", np.zeros(n, np.float32)))
    f_dc = np.asarray(p.f_dc[:n])            # (n, 1, 3)
    for i in range(3):
        cols.append((f"f_dc_{i}", f_dc[:, 0, i]))
    f_rest = np.asarray(p.f_rest[:n])        # (n, M-1, 3)
    flat = f_rest.transpose(0, 2, 1).reshape(n, -1)  # channel-major (3DGS)
    for i in range(flat.shape[1]):
        cols.append((f"f_rest_{i}", flat[:, i]))
    cols.append(("opacity", np.asarray(p.opacity[:n, 0])))
    scaling = np.asarray(p.scaling[:n])
    for i in range(3):
        cols.append((f"scale_{i}", scaling[:, i]))
    if gaussian_dim == 4:
        cols.append(("scale_t", np.asarray(p.scaling_t[:n, 0])))
    rot = np.asarray(p.rotation[:n])
    for i in range(4):
        cols.append((f"rot_{i}", rot[:, i]))
    if gaussian_dim == 4 and rot_4d:
        rot_r = np.asarray(p.rotation_r[:n])
        for i in range(4):
            cols.append((f"rot_r_{i}", rot_r[:, i]))

    dtype = np.dtype([(name, "<f4") for name, _ in cols])
    arr = np.zeros(n, dtype=dtype)
    for name, data in cols:
        arr[name] = data.astype(np.float32)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {name}" for name, _ in cols]
    header.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(arr.tobytes())


def import_gaussians_ply(path: str, capacity: int | None = None,
                         capacity_slack: float = 1.3) -> GaussianState:
    """Read a gaussian cloud PLY back into a padded GaussianState (fresh
    optimizer/statistics, like the reference's create_from_pth,
    `gaussian_model.py:302-329`)."""
    import jax.numpy as jnp

    from ..data.pointcloud import _PLY_DTYPES  # header parser shares dtypes

    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        props, n, fmt = [], 0, None
        while True:
            tok = f.readline().decode("ascii").split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                n = int(tok[2])
            elif tok[0] == "property":
                props.append((tok[-1], _PLY_DTYPES[tok[1]]))
            elif tok[0] == "end_header":
                break
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported gaussian PLY format {fmt}")
        dt = np.dtype([(name, "<" + d) for name, d in props])
        data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)

    names = {name for name, _ in props}
    gaussian_dim = 4 if "t" in names else 3
    rot_4d = "rot_r_0" in names
    n_rest = sum(1 for name in names if name.startswith("f_rest_"))
    sh_channels = 1 + n_rest // 3

    capacity = capacity or capacity_for(n, capacity_slack)
    params = empty_params(capacity, sh_channels)

    def col(name):
        return np.asarray(data[name], np.float32)

    xyz = np.stack([col("x"), col("y"), col("z")], 1)
    f_dc = np.stack([col(f"f_dc_{i}") for i in range(3)], 1)[:, None, :]
    if n_rest:
        rest = np.stack([col(f"f_rest_{i}") for i in range(n_rest)], 1)
        rest = rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    scaling = np.stack([col(f"scale_{i}") for i in range(3)], 1)
    rot = np.stack([col(f"rot_{i}") for i in range(4)], 1)

    def fill(arr, vals):
        return arr.at[:n].set(jnp.asarray(vals, arr.dtype))

    params = params._replace(
        xyz=fill(params.xyz, xyz),
        f_dc=fill(params.f_dc, f_dc),
        f_rest=fill(params.f_rest, rest) if n_rest else params.f_rest,
        opacity=fill(params.opacity, col("opacity")[:, None]),
        scaling=fill(params.scaling, scaling),
        rotation=fill(params.rotation, rot))
    if gaussian_dim == 4:
        params = params._replace(
            t=fill(params.t, col("t")[:, None]),
            scaling_t=fill(params.scaling_t, col("scale_t")[:, None]))
    if rot_4d:
        rot_r = np.stack([col(f"rot_r_{i}") for i in range(4)], 1)
        params = params._replace(rotation_r=fill(params.rotation_r, rot_r))

    zerosP = GaussianParams(*[jnp.zeros_like(x) for x in params])
    zeros1 = jnp.zeros((capacity,), jnp.float32)
    return GaussianState(
        params=params,
        adam=AdamState(zerosP, GaussianParams(*[jnp.zeros_like(x)
                                                for x in params]),
                       jnp.zeros((), jnp.int32)),
        n_active=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=zeros1, t_grad_accum=zeros1,
        denom=zeros1, max_radii2d=zeros1)
