"""Offline MJCF -> Model compiler (host-side tool, never in the hot path).

The reference compiles MJCF with MuJoCo's C compiler at env construction
(/root/reference/envs/fruitfly.py:54-60) and hands the result to brax/MJX.
Here the C compiler is likewise used host-side — it is CPU C code with no
TPU relevance — but the output is frozen into our own ``Model`` pytree with
all structure (tree topology, contact pair table, efc layout) resolved to
compile-time constants, which is what lets the TPU step compile to fully
static shapes.

Spec transforms provided (mirroring reference behaviors):
- free-joint strip for tethered envs      (fruitfly.py:54-60)
- torque-actuator rewrite                 (fruitfly.py:63-69)
- subtree rescale                         (rodent.py:51-65, preprocess.py:80-89)
- solver/iterations overrides             (fruitfly.py:70-79)
- stub meshes for the six fly head/thorax .obj blobs absent from the
  snapshot (assets/fruitfly/.MISSING_LARGE_BLOBS) — parity is defined
  against the MuJoCo C oracle on the *compiled* model, so stubs affect
  both sides identically.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional, Sequence, Tuple

import mujoco
import numpy as np
import jax.numpy as jnp

from brax_tracking_tpu.physics import model as M
from brax_tracking_tpu.physics.plan import make_plan

# ---------------------------------------------------------------------------
# Asset staging (fly stub meshes)
# ---------------------------------------------------------------------------

_FLY_STUB_MESHES = {
    # name: (rx, ry, rz) ellipsoid semi-axes, cm scale consistent with the
    # surrounding fly geometry. Visual/inertial stand-ins only; these geoms
    # are not collision-enabled (contype=conaffinity=0 in the fly XML).
    "head_body.obj": (0.032, 0.030, 0.036),
    "head_black.obj": (0.030, 0.028, 0.033),
    "head_red.obj": (0.028, 0.026, 0.030),
    "head_ocelli.obj": (0.010, 0.010, 0.010),
    "thorax_body.obj": (0.050, 0.045, 0.050),
    "thorax_black.obj": (0.045, 0.040, 0.045),
}


def _write_ellipsoid_obj(path: str, rx: float, ry: float, rz: float, n: int = 12):
    verts, faces = [], []
    for i in range(1, n):
        theta = np.pi * i / n
        for j in range(2 * n):
            phi = np.pi * j / n
            verts.append(
                (
                    rx * np.sin(theta) * np.cos(phi),
                    ry * np.sin(theta) * np.sin(phi),
                    rz * np.cos(theta),
                )
            )
    top = len(verts)
    verts.append((0.0, 0.0, rz))
    bot = len(verts)
    verts.append((0.0, 0.0, -rz))
    ring = 2 * n
    for i in range(n - 2):
        for j in range(ring):
            a, b = i * ring + j, i * ring + (j + 1) % ring
            c, d = (i + 1) * ring + j, (i + 1) * ring + (j + 1) % ring
            faces += [(a, b, d), (a, d, c)]
    for j in range(ring):
        faces.append((top, (j + 1) % ring, j))
        faces.append((bot, (n - 2) * ring + j, (n - 2) * ring + (j + 1) % ring))
    with open(path, "w") as f:
        for v in verts:
            f.write("v %.6f %.6f %.6f\n" % v)
        for a, b, c in faces:
            f.write("f %d %d %d\n" % (a + 1, b + 1, c + 1))


def stage_fly_assets(src_dir: str, build_dir: Optional[str] = None) -> str:
    """Copies the fly MJCF tree to a writable dir and fills in stub meshes.

    Returns the staged directory containing compile-ready XML.
    """
    if build_dir is None:
        build_dir = os.path.join(tempfile.gettempdir(), "btt_fly_assets")
    if not os.path.exists(os.path.join(build_dir, "fruitfly_force_fast.xml")):
        os.makedirs(build_dir, exist_ok=True)
        shutil.copytree(src_dir, build_dir, dirs_exist_ok=True)
    asset_dir = os.path.join(build_dir, "assets")
    os.makedirs(asset_dir, exist_ok=True)
    for name, axes in _FLY_STUB_MESHES.items():
        p = os.path.join(asset_dir, name)
        if not os.path.exists(p):
            _write_ellipsoid_obj(p, *axes)
    return build_dir


# ---------------------------------------------------------------------------
# Spec transforms
# ---------------------------------------------------------------------------


def load_spec(path: str) -> mujoco.MjSpec:
    return mujoco.MjSpec.from_file(path)


def strip_free_joint(spec: mujoco.MjSpec, body_name: str = "thorax") -> mujoco.MjSpec:
    """Deletes the named body's leading free joint (tethered mode).

    Reference behavior at /root/reference/envs/fruitfly.py:54-60.
    """
    body = spec.body(body_name)
    joints = body.joints
    if joints and joints[0].name == "free":
        spec.delete(joints[0])
    return spec


def torque_actuator_rewrite(spec: mujoco.MjSpec) -> mujoco.MjSpec:
    """Converts position-servo actuators to direct torque motors.

    Reference behavior at /root/reference/envs/fruitfly.py:63-69: gain
    becomes the upper force limit, bias is removed.
    """
    for act in spec.actuators:
        force_hi = act.forcerange[1]
        act.gainprm[:] = 0.0
        act.gainprm[0] = force_hi
        act.gaintype = mujoco.mjtGain.mjGAIN_FIXED
        act.biastype = mujoco.mjtBias.mjBIAS_NONE
        act.biasprm[:] = 0.0
    return spec


def rescale_subtree(spec: mujoco.MjSpec, body_name: str, length_factor: float) -> mujoco.MjSpec:
    """Scales all lengths in the subtree rooted at ``body_name``.

    Equivalent of dm_control's rescale.rescale_subtree used by the
    reference (/root/reference/envs/rodent.py:60-64): body/geom/site
    offsets and geom sizes scale by the length factor; the compiler then
    refits masses/inertias from the scaled geometry.
    """

    def recurse(body):
        for child in body.bodies:
            child.pos = np.asarray(child.pos) * length_factor
            recurse(child)
        for geom in body.geoms:
            geom.size = np.asarray(geom.size) * length_factor
            geom.pos = np.asarray(geom.pos) * length_factor
            if hasattr(geom, "fromto") and np.all(np.isfinite(geom.fromto)):
                geom.fromto = np.asarray(geom.fromto) * length_factor
        for site in body.sites:
            site.pos = np.asarray(site.pos) * length_factor
            site.size = np.asarray(site.size) * length_factor
        for joint in body.joints:
            joint.pos = np.asarray(joint.pos) * length_factor

    root = spec.body(body_name)
    recurse(root)
    return spec


def set_solver_options(
    mj_model: mujoco.MjModel,
    solver: str = "cg",
    iterations: int = 6,
    ls_iterations: int = 6,
) -> mujoco.MjModel:
    """Applies the env-level solver overrides (fruitfly.py:70-79)."""
    mj_model.opt.solver = {
        "cg": mujoco.mjtSolver.mjSOL_CG,
        "newton": mujoco.mjtSolver.mjSOL_NEWTON,
    }[solver.lower()]
    mj_model.opt.iterations = iterations
    mj_model.opt.ls_iterations = ls_iterations
    mj_model.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
    return mj_model


# ---------------------------------------------------------------------------
# Contact pair enumeration (static, mirrors mj_collision's filtering)
# ---------------------------------------------------------------------------

# contact slots a pair of geom types can produce
_PAIR_POINTS = {
    (M.GEOM_PLANE, M.GEOM_SPHERE): 1,
    (M.GEOM_PLANE, M.GEOM_CAPSULE): 2,
    (M.GEOM_PLANE, M.GEOM_ELLIPSOID): 1,
    (M.GEOM_PLANE, M.GEOM_BOX): 4,
    (M.GEOM_PLANE, M.GEOM_CYLINDER): 4,
    (M.GEOM_SPHERE, M.GEOM_SPHERE): 1,
    (M.GEOM_SPHERE, M.GEOM_CAPSULE): 1,
    (M.GEOM_SPHERE, M.GEOM_ELLIPSOID): 1,
    (M.GEOM_SPHERE, M.GEOM_BOX): 1,
    (M.GEOM_CAPSULE, M.GEOM_CAPSULE): 2,
    (M.GEOM_CAPSULE, M.GEOM_ELLIPSOID): 1,
    (M.GEOM_CAPSULE, M.GEOM_BOX): 2,
    (M.GEOM_ELLIPSOID, M.GEOM_ELLIPSOID): 1,
    (M.GEOM_SPHERE, M.GEOM_CYLINDER): 1,
    (M.GEOM_CAPSULE, M.GEOM_CYLINDER): 3,
    (M.GEOM_BOX, M.GEOM_BOX): 8,
    # generic convex-convex dual ascent (single contact, like mjc_Convex)
    (M.GEOM_ELLIPSOID, M.GEOM_CYLINDER): 1,
    (M.GEOM_ELLIPSOID, M.GEOM_BOX): 1,
    (M.GEOM_CYLINDER, M.GEOM_CYLINDER): 1,
    (M.GEOM_CYLINDER, M.GEOM_BOX): 1,
    # convex meshes: support-function pairs (hull vertex max = support);
    # plane-mesh emits a 4-deepest-vertex manifold like plane-box
    (M.GEOM_PLANE, M.GEOM_MESH): 4,
    # height fields: per-probe deepest triangle contact (sphere: 1 probe;
    # capsule: 3 probes along the axis). The reference's MJX backend does
    # not step hfield models at all — beyond-parity capability.
    (M.GEOM_HFIELD, M.GEOM_SPHERE): 1,
    (M.GEOM_HFIELD, M.GEOM_CAPSULE): 3,
    (M.GEOM_SPHERE, M.GEOM_MESH): 1,
    (M.GEOM_CAPSULE, M.GEOM_MESH): 1,
    (M.GEOM_ELLIPSOID, M.GEOM_MESH): 1,
    (M.GEOM_CYLINDER, M.GEOM_MESH): 1,
    (M.GEOM_BOX, M.GEOM_MESH): 1,
    (M.GEOM_MESH, M.GEOM_MESH): 1,
}


def _build_meshes(m: mujoco.MjModel, dtype):
    """Convex-hull support data for mesh geoms (static layout).

    Returns (geom_meshidx, mesh_vertnum, mesh_vert): per-geom index into a
    padded (nmeshused, maxvert, 3) vertex array holding each colliding
    mesh's convex-hull vertices in the GEOM frame (MuJoCo bakes the
    mesh->geom transform into the compiled vertices; mjc_Convex composes
    them with geom_xpos/xmat exactly as collision.py does). Padding
    duplicates vertex 0, which is exact for support maxima; the valid
    count is kept for manifold selection (plane-mesh top-4).
    """
    geom_meshidx = np.full(m.ngeom, -1, np.int32)
    mesh_ids = sorted(
        {
            int(m.geom_dataid[g])
            for g in range(m.ngeom)
            if m.geom_type[g] == M.GEOM_MESH
            and (m.geom_contype[g] or m.geom_conaffinity[g])
        }
    )
    if not mesh_ids:
        return geom_meshidx, np.zeros(0, np.int32), np.zeros((0, 0, 3))
    verts = []
    for did in mesh_ids:
        adr, num = int(m.mesh_vertadr[did]), int(m.mesh_vertnum[did])
        v = np.asarray(m.mesh_vert[adr : adr + num], np.float64)
        # MuJoCo precomputes the hull (mesh_graph); using every vertex is
        # equivalent for support functions (max over hull == max over set)
        verts.append(v)
    maxv = max(len(v) for v in verts)
    packed = np.stack(
        [np.concatenate([v, np.tile(v[:1], (maxv - len(v), 1))]) for v in verts]
    )
    for g in range(m.ngeom):
        if m.geom_type[g] == M.GEOM_MESH and int(m.geom_dataid[g]) in mesh_ids:
            geom_meshidx[g] = mesh_ids.index(int(m.geom_dataid[g]))
    return (
        geom_meshidx,
        np.array([len(v) for v in verts], np.int32),
        packed,
    )


def _build_hfields(m: mujoco.MjModel):
    """Static height-field data for hfield geoms.

    Returns (geom_hfieldidx, nrowcol, patch_k, elev, size): per-geom index
    into a padded (nhfused, maxrow, maxcol) elevation array in METERS
    (MuJoCo normalizes hfield_data to [0,1]; elevation = data * size[2]),
    plus the static (K, K) probe-patch side: the narrowphase tests the
    2(K-1)^2 surface triangles under a K x K grid window around each probe
    point, so K must cover the widest colliding geom's footprint
    (2 * bounding radius / finest grid spacing), clamped to the grid.
    """
    geom_hfieldidx = np.full(m.ngeom, -1, np.int32)
    hf_geoms = [
        g
        for g in range(m.ngeom)
        if m.geom_type[g] == M.GEOM_HFIELD
        and (m.geom_contype[g] or m.geom_conaffinity[g])
    ]
    if not hf_geoms:
        return geom_hfieldidx, np.zeros((0, 2), np.int32), 0, np.zeros((0, 0, 0)), np.zeros((0, 4))
    hids = sorted({int(m.geom_dataid[g]) for g in hf_geoms})
    nrowcol = np.array(
        [[int(m.hfield_nrow[h]), int(m.hfield_ncol[h])] for h in hids], np.int32
    )
    size = np.array([m.hfield_size[h] for h in hids], np.float64)
    maxr, maxc = int(nrowcol[:, 0].max()), int(nrowcol[:, 1].max())
    elev = np.zeros((len(hids), maxr, maxc))
    for k, h in enumerate(hids):
        nr, nc = nrowcol[k]
        adr = int(m.hfield_adr[h])
        data = np.asarray(m.hfield_data[adr : adr + nr * nc]).reshape(nr, nc)
        elev[k, :nr, :nc] = data * float(m.hfield_size[h][2])
    for g in hf_geoms:
        geom_hfieldidx[g] = hids.index(int(m.geom_dataid[g]))

    # probe footprint: bounding radius of the largest geom colliding with
    # any hfield, over the finest grid spacing of the used hfields
    reach = 0.0
    for g in range(m.ngeom):
        t = int(m.geom_type[g])
        if t == M.GEOM_SPHERE:
            r = float(m.geom_size[g, 0])
        elif t == M.GEOM_CAPSULE:
            # probed as 3 spheres along the axis: per-probe reach covers
            # radius + half the inter-probe spacing (half_len / 2)
            r = float(m.geom_size[g, 0] + 0.5 * m.geom_size[g, 1])
        else:
            continue
        reach = max(reach, r)
    spacing = np.inf
    for k in range(len(hids)):
        nr, nc = nrowcol[k]
        if nc > 1:
            spacing = min(spacing, 2.0 * size[k, 0] / (nc - 1))
        if nr > 1:
            spacing = min(spacing, 2.0 * size[k, 1] / (nr - 1))
    if not np.isfinite(spacing):
        spacing = 1.0
    patch_k = int(np.ceil(2.0 * reach / spacing)) + 3
    patch_k = min(patch_k, int(nrowcol[:, 0].min()), int(nrowcol[:, 1].min()))
    patch_k = max(patch_k, 2)
    return geom_hfieldidx, nrowcol, patch_k, elev, size


def _candidate_pairs(m: mujoco.MjModel):
    """Enumerates geom pairs that can ever collide, per MuJoCo's filters:
    same-body / same-weld exclusion, parent-child filter (world excepted),
    contype/conaffinity compatibility, and <exclude> signatures."""
    excludes = set()
    for s in m.exclude_signature:
        excludes.add((int(s) >> 16, int(s) & 0xFFFF))
    pairs = []
    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
            w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
            if w1 == w2:
                continue
            # parent-child filter (through welds), world excepted
            wp1 = int(m.body_weldid[m.body_parentid[w1]])
            wp2 = int(m.body_weldid[m.body_parentid[w2]])
            if (wp1 == w2 and w2 != 0) or (wp2 == w1 and w1 != 0):
                continue
            if (b1, b2) in excludes or (b2, b1) in excludes:
                continue
            t1 = int(m.geom_contype[g1]) & int(m.geom_conaffinity[g2])
            t2 = int(m.geom_contype[g2]) & int(m.geom_conaffinity[g1])
            if not (t1 or t2):
                continue
            # order so the lower geom-type enum comes first (plane first)
            if m.geom_type[g1] <= m.geom_type[g2]:
                pairs.append((g1, g2))
            else:
                pairs.append((g2, g1))
    return pairs


def _mix_pair_params(m: mujoco.MjModel, g1: int, g2: int):
    """MuJoCo's contact parameter mixing (priority / solmix rules)."""
    p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
    f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
    if p1 != p2:
        hi = g1 if p1 > p2 else g2
        condim = int(m.geom_condim[hi])
        friction3 = m.geom_friction[hi].copy()
        solref = m.geom_solref[hi].copy()
        solimp = m.geom_solimp[hi].copy()
    else:
        condim = int(max(m.geom_condim[g1], m.geom_condim[g2]))
        friction3 = np.maximum(f1, f2)
        s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
        if s1 >= M.MINVAL and s2 >= M.MINVAL:
            mix = s1 / (s1 + s2)
        elif s1 < M.MINVAL and s2 < M.MINVAL:
            mix = 0.5
        else:
            mix = 1.0 if s1 >= M.MINVAL else 0.0
        r1, r2 = m.geom_solref[g1], m.geom_solref[g2]
        if r1[0] > 0 and r2[0] > 0:
            solref = mix * r1 + (1 - mix) * r2
        else:
            solref = np.minimum(r1, r2)
        solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    friction5 = np.array(
        [friction3[0], friction3[0], friction3[1], friction3[2], friction3[2]]
    )
    margin = float(max(m.geom_margin[g1], m.geom_margin[g2]))
    gap = float(max(m.geom_gap[g1], m.geom_gap[g2]))
    return condim, friction5, solref, solimp, margin, gap


def _build_pairs(m: mujoco.MjModel, dtype) -> M.ContactPairs:
    raw = _candidate_pairs(m)
    g1s, g2s, npoints, condims = [], [], [], []
    frictions, solrefs, solimps, margins, gaps = [], [], [], [], []
    for g1, g2 in raw:
        key = (int(m.geom_type[g1]), int(m.geom_type[g2]))
        if key not in _PAIR_POINTS:
            raise NotImplementedError(
                f"collision pair {key} not supported (geoms {g1},{g2})"
            )
        condim, fr, sr, si, margin, gap = _mix_pair_params(m, g1, g2)
        g1s.append(g1)
        g2s.append(g2)
        npoints.append(_PAIR_POINTS[key])
        condims.append(condim)
        frictions.append(fr)
        solrefs.append(sr)
        solimps.append(si)
        margins.append(margin)
        gaps.append(gap)
    if not g1s:
        z = lambda *s: jnp.zeros(s, dtype)
        return M.ContactPairs(
            geom1=np.zeros(0, np.int32),
            geom2=np.zeros(0, np.int32),
            npoint=np.zeros(0, np.int32),
            condim=np.zeros(0, np.int32),
            friction=z(0, 5),
            solref=z(0, 2),
            solimp=z(0, 5),
            margin=z(0),
            gap=z(0),
        )
    return M.ContactPairs(
        geom1=np.array(g1s, np.int32),
        geom2=np.array(g2s, np.int32),
        npoint=np.array(npoints, np.int32),
        condim=np.array(condims, np.int32),
        friction=jnp.array(np.stack(frictions), dtype),
        solref=jnp.array(np.stack(solrefs), dtype),
        solimp=jnp.array(np.stack(solimps), dtype),
        margin=jnp.array(margins, dtype),
        gap=jnp.array(gaps, dtype),
    )


# ---------------------------------------------------------------------------
# Static-structure derivations
# ---------------------------------------------------------------------------


def _dof_ancestor_mask(m: mujoco.MjModel) -> np.ndarray:
    nv = m.nv
    mask = np.zeros((nv, nv), bool)
    for i in range(nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = int(m.dof_parentid[j])
    return mask


def _body_dof_mask(m: mujoco.MjModel) -> np.ndarray:
    """mask[b, j] = True iff dof j is in the kinematic chain above body b."""
    mask = np.zeros((m.nbody, m.nv), bool)
    for b in range(1, m.nbody):
        body = b
        while body > 0:
            adr, num = int(m.body_dofadr[body]), int(m.body_dofnum[body])
            mask[b, adr : adr + num] = True
            body = int(m.body_parentid[body])
    return mask


def _body_tree_levels(m: mujoco.MjModel):
    depth = np.zeros(m.nbody, np.int32)
    for b in range(1, m.nbody):
        depth[b] = depth[int(m.body_parentid[b])] + 1
    levels = []
    for d in range(1, depth.max() + 1 if m.nbody > 1 else 1):
        levels.append(np.nonzero(depth == d)[0].astype(np.int32))
    return tuple(levels)


def _names(m: mujoco.MjModel):
    def all_names(objtype, count):
        return [
            mujoco.mj_id2name(m, objtype, i) or "" for i in range(count)
        ]

    return {
        "body": all_names(mujoco.mjtObj.mjOBJ_BODY, m.nbody),
        "joint": all_names(mujoco.mjtObj.mjOBJ_JOINT, m.njnt),
        "geom": all_names(mujoco.mjtObj.mjOBJ_GEOM, m.ngeom),
        "site": all_names(mujoco.mjtObj.mjOBJ_SITE, m.nsite),
        "actuator": all_names(mujoco.mjtObj.mjOBJ_ACTUATOR, m.nu),
        "sensor": all_names(mujoco.mjtObj.mjOBJ_SENSOR, m.nsensor),
    }


def name2id(model: M.Model, objtype: str, name: str) -> int:
    """mj_name2id semantics: returns -1 when absent (the reference's config
    typos rely on this — SURVEY.md faithful-behavior checklist)."""
    try:
        return model.names[objtype].index(name)
    except ValueError:
        return -1


# ---------------------------------------------------------------------------
# Sensor extraction
# ---------------------------------------------------------------------------

_SENSOR_MAP = {
    mujoco.mjtSensor.mjSENS_TOUCH: M.SENS_TOUCH,
    mujoco.mjtSensor.mjSENS_ACCELEROMETER: M.SENS_ACCELEROMETER,
    mujoco.mjtSensor.mjSENS_VELOCIMETER: M.SENS_VELOCIMETER,
    mujoco.mjtSensor.mjSENS_GYRO: M.SENS_GYRO,
    mujoco.mjtSensor.mjSENS_SUBTREELINVEL: M.SENS_SUBTREELINVEL,
}


# ---------------------------------------------------------------------------
# Main entry: MjModel -> Model
# ---------------------------------------------------------------------------


def model_from_mj(m: mujoco.MjModel, dtype=jnp.float32) -> M.Model:
    """Freezes a compiled mujoco.MjModel into our TPU Model pytree."""
    j = lambda x: jnp.array(np.asarray(x), dtype)

    supported_jnt = {0, 1, 2, 3}
    assert set(np.unique(m.jnt_type)).issubset(supported_jnt)
    if m.ntendon:
        # only fixed tendons (rodent.xml:521-560)
        assert all(
            int(w) == int(mujoco.mjtWrap.mjWRAP_JOINT) for w in m.wrap_type
        ), "only fixed tendons supported"

    sensor_types = []
    for t in m.sensor_type:
        if int(t) not in [int(k) for k in _SENSOR_MAP]:
            raise NotImplementedError(f"sensor type {t}")
        sensor_types.append(_SENSOR_MAP[mujoco.mjtSensor(int(t))])

    opt = M.Option(
        timestep=j(m.opt.timestep),
        gravity=j(m.opt.gravity),
        wind=j(m.opt.wind),
        density=j(m.opt.density),
        viscosity=j(m.opt.viscosity),
        impratio=j(m.opt.impratio),
        tolerance=j(m.opt.tolerance),
        ls_tolerance=j(m.opt.ls_tolerance),
        meaninertia=j(m.stat.meaninertia),
        integrator=int(m.opt.integrator),
        cone=int(m.opt.cone),
        solver=int(m.opt.solver),
        iterations=int(m.opt.iterations),
        ls_iterations=int(m.opt.ls_iterations),
        disableflags=int(m.opt.disableflags),
    )

    return M.Model(
        opt=opt,
        nq=m.nq,
        nv=m.nv,
        nu=m.nu,
        na=m.na,
        nbody=m.nbody,
        njnt=m.njnt,
        ngeom=m.ngeom,
        nsite=m.nsite,
        ntendon=m.ntendon,
        nwrap=m.nwrap,
        nsensor=m.nsensor,
        nsensordata=m.nsensordata,
        body_parentid=np.asarray(m.body_parentid, np.int32),
        body_rootid=np.asarray(m.body_rootid, np.int32),
        body_weldid=np.asarray(m.body_weldid, np.int32),
        body_jntadr=np.asarray(m.body_jntadr, np.int32),
        body_jntnum=np.asarray(m.body_jntnum, np.int32),
        body_dofadr=np.asarray(m.body_dofadr, np.int32),
        body_dofnum=np.asarray(m.body_dofnum, np.int32),
        jnt_type=np.asarray(m.jnt_type, np.int32),
        jnt_qposadr=np.asarray(m.jnt_qposadr, np.int32),
        jnt_dofadr=np.asarray(m.jnt_dofadr, np.int32),
        jnt_bodyid=np.asarray(m.jnt_bodyid, np.int32),
        jnt_limited=np.asarray(m.jnt_limited, bool),
        dof_bodyid=np.asarray(m.dof_bodyid, np.int32),
        dof_jntid=np.asarray(m.dof_jntid, np.int32),
        dof_parentid=np.asarray(m.dof_parentid, np.int32),
        geom_type=np.asarray(m.geom_type, np.int32),
        geom_bodyid=np.asarray(m.geom_bodyid, np.int32),
        geom_condim=np.asarray(m.geom_condim, np.int32),
        geom_priority=np.asarray(m.geom_priority, np.int32),
        site_bodyid=np.asarray(m.site_bodyid, np.int32),
        site_type=np.asarray(m.site_type, np.int32),
        tendon_adr=np.asarray(m.tendon_adr, np.int32),
        tendon_num=np.asarray(m.tendon_num, np.int32),
        wrap_objid=np.asarray(m.wrap_objid, np.int32),
        actuator_trntype=np.asarray(m.actuator_trntype, np.int32),
        actuator_dyntype=np.asarray(m.actuator_dyntype, np.int32),
        actuator_gaintype=np.asarray(m.actuator_gaintype, np.int32),
        actuator_biastype=np.asarray(m.actuator_biastype, np.int32),
        actuator_trnid=np.asarray(m.actuator_trnid, np.int32),
        actuator_actadr=np.asarray(m.actuator_actadr, np.int32),
        actuator_actnum=np.asarray(m.actuator_actnum, np.int32),
        actuator_ctrllimited=np.asarray(m.actuator_ctrllimited, bool),
        actuator_forcelimited=np.asarray(m.actuator_forcelimited, bool),
        actuator_actlimited=np.asarray(m.actuator_actlimited, bool),
        sensor_type=np.asarray(sensor_types, np.int32),
        sensor_objid=np.asarray(m.sensor_objid, np.int32),
        sensor_adr=np.asarray(m.sensor_adr, np.int32),
        sensor_dim=np.asarray(m.sensor_dim, np.int32),
        has_damping=bool(np.any(m.dof_damping != 0)),
        has_fluid=bool(m.opt.density > 0 or m.opt.viscosity > 0),
        dof_ancestor_mask=_dof_ancestor_mask(m),
        body_dof_mask=_body_dof_mask(m),
        plan=make_plan(m),
        body_tree_levels=_body_tree_levels(m),
        names=_names(m),
        qpos0=j(m.qpos0),
        qpos_spring=j(m.qpos_spring),
        body_pos=j(m.body_pos),
        body_quat=j(m.body_quat),
        body_ipos=j(m.body_ipos),
        body_iquat=j(m.body_iquat),
        body_mass=j(m.body_mass),
        body_inertia=j(m.body_inertia),
        body_invweight0=j(m.body_invweight0),
        body_subtreemass=j(m.body_subtreemass),
        jnt_axis=j(m.jnt_axis),
        jnt_pos=j(m.jnt_pos),
        jnt_range=j(m.jnt_range),
        jnt_stiffness=j(m.jnt_stiffness),
        jnt_springref=j(m.qpos_spring[m.jnt_qposadr]) if m.njnt else j(np.zeros(0)),
        jnt_solref=j(m.jnt_solref),
        jnt_solimp=j(m.jnt_solimp),
        jnt_margin=j(m.jnt_margin),
        dof_armature=j(m.dof_armature),
        dof_damping=j(m.dof_damping),
        dof_invweight0=j(m.dof_invweight0),
        geom_pos=j(m.geom_pos),
        geom_quat=j(m.geom_quat),
        geom_size=j(m.geom_size),
        site_pos=j(m.site_pos),
        site_quat=j(m.site_quat),
        tendon_stiffness=j(m.tendon_stiffness),
        tendon_damping=j(m.tendon_damping),
        tendon_lengthspring=j(m.tendon_lengthspring),
        tendon_invweight0=j(m.tendon_invweight0),
        wrap_prm=j(m.wrap_prm),
        actuator_dynprm=j(m.actuator_dynprm),
        actuator_gainprm=j(m.actuator_gainprm),
        actuator_biasprm=j(m.actuator_biasprm),
        actuator_ctrlrange=j(m.actuator_ctrlrange),
        actuator_forcerange=j(m.actuator_forcerange),
        actuator_actrange=j(m.actuator_actrange),
        actuator_gear=j(m.actuator_gear),
        actuator_lengthrange=j(m.actuator_lengthrange),
        actuator_acc0=j(m.actuator_acc0),
        pairs=_build_pairs(m, dtype),
        **_mesh_fields(m, dtype),
    )


def _mesh_fields(m: mujoco.MjModel, dtype):
    geom_meshidx, mesh_vertnum, mesh_vert = _build_meshes(m, dtype)
    geom_hfieldidx, hf_nrowcol, patch_k, hf_elev, hf_size = _build_hfields(m)
    return dict(
        geom_meshidx=geom_meshidx,
        mesh_vertnum=mesh_vertnum,
        mesh_vert=jnp.asarray(mesh_vert, dtype),
        geom_hfieldidx=geom_hfieldidx,
        hfield_nrowcol=hf_nrowcol,
        hfield_patch=patch_k,
        hfield_elev=jnp.asarray(hf_elev, dtype),
        hfield_size=jnp.asarray(hf_size, dtype),
    )


def build_model(
    mjcf_path: str,
    free_jnt: bool = True,
    torque_actuators: bool = False,
    scale_factor: float = 1.0,
    rescale_root: str = "torso",
    solver: Optional[str] = None,
    iterations: int = 6,
    ls_iterations: int = 6,
    dtype=jnp.float32,
    return_mj: bool = False,
):
    """Full build pipeline: MJCF -> transforms -> compile -> Model pytree.

    Mirrors the env-construction path of the reference
    (/root/reference/envs/fruitfly.py:54-89) as a host-side offline step.

    ``builtin:<name>`` paths resolve into this package's assets directory.
    """
    if mjcf_path.startswith("builtin:"):
        mjcf_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            mjcf_path[len("builtin:"):],
        )
    if "fruitfly" in os.path.basename(mjcf_path):
        staged = stage_fly_assets(os.path.dirname(mjcf_path))
        mjcf_path = os.path.join(staged, os.path.basename(mjcf_path))
    spec = load_spec(mjcf_path)
    if not free_jnt:
        strip_free_joint(spec)
    if torque_actuators:
        torque_actuator_rewrite(spec)
    if scale_factor != 1.0:
        rescale_subtree(spec, rescale_root, scale_factor)
    mj_model = spec.compile()
    if solver is not None:
        set_solver_options(mj_model, solver, iterations, ls_iterations)
    model = model_from_mj(mj_model, dtype=dtype)
    if return_mj:
        return model, mj_model
    return model
