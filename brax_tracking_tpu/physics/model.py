"""Model / Data pytrees for the TPU engine.

Design rules (TPU-first):

- **Static structure vs traced parameters.** Everything that determines
  control flow, shapes, or indexing (tree topology, joint types, contact
  pair table, actuator wiring) is *static*: plain numpy arrays / ints held
  as non-pytree fields, so jit sees constants and every gather lowers to a
  static slice. Everything physical (masses, lengths, gains, solver params)
  is a traced jnp leaf, so domain randomization can vmap over a batched
  Model without recompiling.

- **Static shapes.** The contact problem is fixed at model-build time: the
  candidate pair list (and hence the efc row count) is a compile-time
  constant; contacts switch on/off by masking, never by shape.

- **Dense, batch-leading.** The mass matrix is dense (nv x nv); with
  thousands of lockstep envs the batch dimension feeds the MXU/VPU far
  better than MuJoCo's CSR-style sparsity would.

Field names deliberately follow MuJoCo's vocabulary (qpos, xquat, cdof, ...)
so that parity tests against the C oracle read naturally. The semantic
contract is MuJoCo's (see mujoco.readthedocs.io "Computation"), but the
implementation is original JAX.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from flax import struct

# MuJoCo enums mirrored as plain ints (values match mujoco.mjtJoint etc. so
# the spec compiler can copy them straight through).
JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE = 0, 1, 2, 3
GEOM_PLANE, GEOM_HFIELD, GEOM_SPHERE, GEOM_CAPSULE = 0, 1, 2, 3
GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX, GEOM_MESH = 4, 5, 6, 7
TRN_JOINT, TRN_JOINTINPARENT, TRN_SLIDERCRANK, TRN_TENDON, TRN_SITE = 0, 1, 2, 3, 4
DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT, DYN_MUSCLE = 0, 1, 2, 3, 4
GAIN_FIXED, GAIN_AFFINE, GAIN_MUSCLE = 0, 1, 2
BIAS_NONE, BIAS_AFFINE, BIAS_MUSCLE = 0, 1, 2
CONE_PYRAMIDAL, CONE_ELLIPTIC = 0, 1
SOLVER_PGS, SOLVER_CG, SOLVER_NEWTON = 0, 1, 2
INT_EULER, INT_RK4, INT_IMPLICIT, INT_IMPLICITFAST = 0, 1, 2, 3
# Sensor types used by the reference models (assets/rodent.xml:615-624).
SENS_TOUCH, SENS_ACCELEROMETER, SENS_VELOCIMETER, SENS_GYRO = 0, 1, 2, 3
SENS_SUBTREELINVEL = 4

# mjMINVAL equivalent for guarded divisions.
MINVAL = 1e-15


def _static(**kwargs):
    return struct.field(pytree_node=False, **kwargs)


@struct.dataclass
class Option:
    """Simulation options (mjOption subset the target models exercise)."""

    # --- traced physical parameters ---
    timestep: jax.Array
    gravity: jax.Array  # (3,)
    wind: jax.Array  # (3,)
    density: jax.Array  # fluid density (fly: 0.00128)
    viscosity: jax.Array  # fluid viscosity (fly: 0.000185)
    impratio: jax.Array  # friction-to-normal impedance ratio
    tolerance: jax.Array  # solver early-exit tolerance
    ls_tolerance: jax.Array  # line-search tolerance
    # --- traced derived stats ---
    meaninertia: jax.Array = None  # mjStatistic.meaninertia (solver scaling)
    # --- static control flow ---
    integrator: int = _static(default=INT_EULER)
    cone: int = _static(default=CONE_PYRAMIDAL)
    solver: int = _static(default=SOLVER_NEWTON)
    iterations: int = _static(default=100)
    ls_iterations: int = _static(default=50)
    disableflags: int = _static(default=0)


@struct.dataclass
class ContactPairs:
    """Static candidate contact-pair table, fixed at model build.

    For the target models every candidate pair involves at most
    ``max_points`` contact points (plane-capsule: 2, plane-sphere/ellipsoid:
    1, sphere/capsule pairs: 1..2), so the total contact count
    ``ncon = sum(pair_npoint)`` is a compile-time constant. Activation is a
    runtime mask (dist < margin), never a shape change.
    """

    # static wiring
    geom1: Any = _static(default=None)  # (npair,) np.int32
    geom2: Any = _static(default=None)  # (npair,) np.int32
    npoint: Any = _static(default=None)  # (npair,) np.int32 contact slots/pair
    condim: Any = _static(default=None)  # (npair,) np.int32
    # traced mixed material parameters (per pair)
    friction: jax.Array = None  # (npair, 5)
    solref: jax.Array = None  # (npair, 2)
    solimp: jax.Array = None  # (npair, 5)
    margin: jax.Array = None  # (npair,)
    gap: jax.Array = None  # (npair,)

    @property
    def count(self) -> int:
        return 0 if self.geom1 is None else int(np.sum(self.npoint))


@struct.dataclass
class Model:
    """Immutable compiled model. Built offline by ``spec.build_model``."""

    opt: Option

    # ------- sizes (static python ints) -------
    nq: int = _static(default=0)
    nv: int = _static(default=0)
    nu: int = _static(default=0)
    na: int = _static(default=0)
    nbody: int = _static(default=0)
    njnt: int = _static(default=0)
    ngeom: int = _static(default=0)
    nsite: int = _static(default=0)
    ntendon: int = _static(default=0)
    nwrap: int = _static(default=0)
    nsensor: int = _static(default=0)
    nsensordata: int = _static(default=0)

    # ------- static structure (numpy, non-pytree) -------
    body_parentid: Any = _static(default=None)
    body_rootid: Any = _static(default=None)
    body_weldid: Any = _static(default=None)
    body_jntadr: Any = _static(default=None)
    body_jntnum: Any = _static(default=None)
    body_dofadr: Any = _static(default=None)
    body_dofnum: Any = _static(default=None)
    jnt_type: Any = _static(default=None)
    jnt_qposadr: Any = _static(default=None)
    jnt_dofadr: Any = _static(default=None)
    jnt_bodyid: Any = _static(default=None)
    jnt_limited: Any = _static(default=None)
    dof_bodyid: Any = _static(default=None)
    dof_jntid: Any = _static(default=None)
    dof_parentid: Any = _static(default=None)
    geom_type: Any = _static(default=None)
    geom_bodyid: Any = _static(default=None)
    geom_condim: Any = _static(default=None)
    geom_priority: Any = _static(default=None)
    site_bodyid: Any = _static(default=None)
    site_type: Any = _static(default=None)
    tendon_adr: Any = _static(default=None)
    tendon_num: Any = _static(default=None)
    wrap_objid: Any = _static(default=None)  # joint ids for fixed tendons
    actuator_trntype: Any = _static(default=None)
    actuator_dyntype: Any = _static(default=None)
    actuator_gaintype: Any = _static(default=None)
    actuator_biastype: Any = _static(default=None)
    actuator_trnid: Any = _static(default=None)  # (nu, 2)
    actuator_actadr: Any = _static(default=None)
    actuator_actnum: Any = _static(default=None)
    actuator_ctrllimited: Any = _static(default=None)
    actuator_forcelimited: Any = _static(default=None)
    actuator_actlimited: Any = _static(default=None)
    sensor_type: Any = _static(default=None)
    sensor_objid: Any = _static(default=None)
    sensor_adr: Any = _static(default=None)
    sensor_dim: Any = _static(default=None)
    # derived static structure
    has_damping: bool = _static(default=False)  # static: any dof_damping != 0
    has_fluid: bool = _static(default=False)  # static: density or viscosity > 0
    dof_ancestor_mask: Any = _static(default=None)  # (nv, nv) bool, [i,j]=j anc-or-self of i
    body_dof_mask: Any = _static(default=None)  # (nbody, nv) bool, [b,j]=dof j moves body b
    plan: Any = _static(default=None)  # physics.plan.Plan (level-vectorized execution)
    body_tree_levels: Any = _static(default=None)  # tuple of np arrays, BFS levels (excl. world)
    names: Any = _static(default=None)  # dict: {'body': [...], 'joint': [...], ...}
    # mesh collision (convex hull support data; spec._build_meshes)
    geom_meshidx: Any = _static(default=None)  # (ngeom,) int32 into mesh_vert, -1 = not a mesh
    mesh_vertnum: Any = _static(default=None)  # (nmeshused,) int32 valid verts
    # height-field collision (spec._build_hfields)
    geom_hfieldidx: Any = _static(default=None)  # (ngeom,) int32 into hfield_*, -1 = not a hfield
    hfield_nrowcol: Any = _static(default=None)  # (nhfused, 2) int (nrow, ncol)
    hfield_patch: int = _static(default=0)  # static K: (K, K) grid patch per contact probe

    # ------- traced parameters (jnp leaves) -------
    qpos0: jax.Array = None
    qpos_spring: jax.Array = None
    body_pos: jax.Array = None
    body_quat: jax.Array = None
    body_ipos: jax.Array = None
    body_iquat: jax.Array = None
    body_mass: jax.Array = None
    body_inertia: jax.Array = None
    body_invweight0: jax.Array = None  # (nbody, 2) [trn, rot]
    body_subtreemass: jax.Array = None
    jnt_axis: jax.Array = None
    jnt_pos: jax.Array = None
    jnt_range: jax.Array = None
    jnt_stiffness: jax.Array = None
    jnt_springref: jax.Array = None
    jnt_solref: jax.Array = None
    jnt_solimp: jax.Array = None
    jnt_margin: jax.Array = None
    dof_armature: jax.Array = None
    dof_damping: jax.Array = None
    dof_invweight0: jax.Array = None
    geom_pos: jax.Array = None
    geom_quat: jax.Array = None
    geom_size: jax.Array = None
    site_pos: jax.Array = None
    site_quat: jax.Array = None
    tendon_stiffness: jax.Array = None
    tendon_damping: jax.Array = None
    tendon_lengthspring: jax.Array = None
    tendon_invweight0: jax.Array = None
    wrap_prm: jax.Array = None  # fixed-tendon joint coefficients
    actuator_dynprm: jax.Array = None  # (nu, 10)
    actuator_gainprm: jax.Array = None
    actuator_biasprm: jax.Array = None
    actuator_ctrlrange: jax.Array = None
    actuator_forcerange: jax.Array = None
    actuator_actrange: jax.Array = None
    actuator_gear: jax.Array = None  # (nu, 6)
    actuator_lengthrange: jax.Array = None  # (nu, 2) muscle operating range
    actuator_acc0: jax.Array = None  # (nu,) norm of unit-force qacc (muscle)
    mesh_vert: jax.Array = None  # (nmeshused, maxvert, 3) hull verts, geom frame
    hfield_elev: jax.Array = None  # (nhfused, maxrow, maxcol) elevations, meters
    hfield_size: jax.Array = None  # (nhfused, 4) rx ry z_top z_bottom
    pairs: ContactPairs = None

    @property
    def ncon(self) -> int:
        """Compile-time contact slot count."""
        return self.pairs.count if self.pairs is not None else 0


@struct.dataclass
class Data:
    """Per-step simulation state. All fields batched by vmap at the env layer."""

    # state
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    act: jax.Array  # (na,)
    time: jax.Array  # ()
    # control (set by step())
    ctrl: jax.Array  # (nu,)
    # position-stage products
    xpos: jax.Array = None  # (nbody, 3)
    xquat: jax.Array = None  # (nbody, 4)
    xmat: jax.Array = None  # (nbody, 3, 3)
    xipos: jax.Array = None  # (nbody, 3)
    ximat: jax.Array = None  # (nbody, 3, 3)
    xanchor: jax.Array = None  # (njnt, 3)
    xaxis: jax.Array = None  # (njnt, 3)
    geom_xpos: jax.Array = None  # (ngeom, 3)
    geom_xmat: jax.Array = None  # (ngeom, 3, 3)
    geom_xquat: jax.Array = None  # (ngeom, 4) — mats derivable on demand
    site_xpos: jax.Array = None  # (nsite, 3)
    site_xmat: jax.Array = None  # (nsite, 3, 3)
    site_xquat: jax.Array = None  # (nsite, 4)
    subtree_com: jax.Array = None  # (nbody, 3)
    # c-frame quantities are component-major (components, entities): the big
    # entity axis must ride the 128-lane dimension on TPU (see math/spatial.py)
    cinert_s: jax.Array = None  # (6, nbody) packed sym [xx,yy,zz,xy,xz,yz]
    cinert_h: jax.Array = None  # (3, nbody)
    cdof: jax.Array = None  # (6, nv)
    ten_length: jax.Array = None  # (ntendon,)
    ten_J: jax.Array = None  # (ntendon, nv)
    # velocity-stage products
    cvel: jax.Array = None  # (6, nbody)
    cdof_dot: jax.Array = None  # (6, nv)
    # dynamics products
    crb_f: jax.Array = None  # (6, nv) composite-inertia * cdof (qM factor)
    qM: jax.Array = None  # (nv, nv) dense
    qLD: jax.Array = None  # (nv, nv) cholesky factor of qM
    qMinv: jax.Array = None  # (nv, nv) inverse of qM (XLA solver path)
    qMhinv: jax.Array = None  # (nv, nv) inverse of qM + h diag(damping)
    qvel_next: jax.Array = None  # (nv,) Euler velocity update (quad-kernel path)
    qfrc_bias: jax.Array = None  # (nv,)
    qfrc_passive: jax.Array = None  # (nv,)
    qfrc_actuator: jax.Array = None  # (nv,)
    actuator_force: jax.Array = None  # (nu,)
    act_dot: jax.Array = None  # (na,)
    qfrc_smooth: jax.Array = None  # (nv,)
    qacc_smooth: jax.Array = None  # (nv,)
    # contacts (static slot count)
    contact_dist: jax.Array = None  # (ncon,)
    contact_pos: jax.Array = None  # (ncon, 3)
    contact_frame: jax.Array = None  # (ncon, 3, 3) rows: normal, tan1, tan2
    # low-rank contact-jacobian factor: J_con rows = P @ (con_A[r] @ cdof)
    # summed over kinematic roots r with static dof masks (constraint.
    # _contact_jac); lets the megakernel assemble J in VMEM from (6,nv)
    # factors instead of reading a transposed (nefc, nv, B) array from HBM
    con_A: jax.Array = None  # (nroots, ncon, 3, 6)
    # constraint rows (static layout; see constraint.efc_layout)
    # Constraint jacobian, split by structure: limit rows are one-hot
    # (a runtime sign at a static dof), so only the contact block is dense.
    # Row order in all (nefc,) vectors: limits [0, nlim) then contacts.
    efc_Jc: jax.Array = None  # (nefc - nlim, nv) contact-row jacobian block
    efc_jsign: jax.Array = None  # (nlim,) limit-row signs (+-1)
    efc_D: jax.Array = None  # (nefc,)
    efc_aref: jax.Array = None  # (nefc,)
    efc_pos: jax.Array = None  # (nefc,)
    efc_margin: jax.Array = None  # (nefc,)
    # constraint solve products
    efc_force: jax.Array = None  # (nefc,)
    qfrc_constraint: jax.Array = None  # (nv,)
    qacc: jax.Array = None  # (nv,)
    # solver warm start: previous step's qacc (mj_forward copies qacc into
    # qacc_warmstart after the constraint solve; the next solve starts from
    # whichever of {warmstart, qacc_smooth} has lower primal cost —
    # engine_solver.c warmstart semantics, also implemented by MJX).
    # None (fresh make_data) => cold start from qacc_smooth.
    qacc_warmstart: jax.Array = None  # (nv,)
    # sensors
    sensordata: jax.Array = None  # (nsensordata,)
