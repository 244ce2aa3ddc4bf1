"""Static execution plans derived from model structure at build time.

The engine never loops over bodies at trace time; instead the spec compiler
partitions the tree into depth levels and joint-type groups, and the
kinematics/dynamics kernels execute one vectorized op per (level, group).
All arrays here are plain numpy — compile-time constants to XLA.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np


@dataclass(frozen=True)
class SlotGroup:
    """Bodies in one tree level holding a joint of one type at slot s."""

    level_pos: np.ndarray  # positions within the level's body array
    body: np.ndarray  # body ids
    jid: np.ndarray  # joint ids
    qadr: np.ndarray
    dadr: np.ndarray


@dataclass(frozen=True)
class Level:
    bodies: np.ndarray  # body ids at this depth
    parents: np.ndarray  # parent body ids
    free: SlotGroup  # bodies whose single joint is FREE
    fixed_pos: np.ndarray  # level positions of jointless bodies
    slots: Tuple[Tuple[SlotGroup, SlotGroup, SlotGroup], ...]
    # slots[s] = (hinge, slide, ball) groups for joint slot s


@dataclass(frozen=True)
class Plan:
    levels: Tuple[Level, ...]
    # joint-type partitions over all joints (for cdof etc.)
    jnt_by_type: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]
    # tree-accumulation mask: SUB[p, b] = 1 iff p is ancestor-or-self of b.
    # Subtree sums are SUB @ x; root-to-body prefix sums are SUB.T @ x —
    # single MXU matmuls instead of sequential per-level scatters (the TPU
    # cannot scatter fast, but it can matmul for free).
    body_subtree_mask: np.ndarray  # (nbody, nbody) float
    # com_vel helpers
    dof_suffix_mask: np.ndarray  # (nv, nv) float: same-body, >= group start
    free_trans_dof: np.ndarray  # (nv,) bool: translational dofs of free joints
    # scalar-joint helpers (springs, integration)
    scalar_qadr: np.ndarray
    scalar_dadr: np.ndarray
    scalar_jid: np.ndarray
    quat_jnt: Tuple[Tuple[int, int, int], ...]  # (jtype, qadr, dadr) for free/ball


def _slot_group(m, bodies, level_pos, slot) -> List[Tuple[int, int, int]]:
    out = []
    for pos, b in zip(level_pos, bodies):
        if m.body_jntnum[b] > slot:
            out.append((pos, b, int(m.body_jntadr[b]) + slot))
    return out


def _mk_group(m, rows):
    if not rows:
        e = np.zeros(0, np.int32)
        return SlotGroup(e, e, e, e, e)
    pos, body, jid = (np.array(x, np.int32) for x in zip(*rows))
    return SlotGroup(
        pos, body, jid,
        np.asarray(m.jnt_qposadr)[jid].astype(np.int32),
        np.asarray(m.jnt_dofadr)[jid].astype(np.int32),
    )


def make_plan(m) -> Plan:
    """Builds the static execution plan from a compiled mujoco model
    (or any object exposing the same structural arrays)."""
    nbody, njnt, nv = int(m.nbody), int(m.njnt), int(m.nv)
    depth = np.zeros(nbody, np.int32)
    for b in range(1, nbody):
        depth[b] = depth[int(m.body_parentid[b])] + 1

    levels = []
    maxd = depth.max() if nbody > 1 else 0
    for dlev in range(1, maxd + 1):
        bodies = np.nonzero(depth == dlev)[0].astype(np.int32)
        parents = np.asarray(m.body_parentid)[bodies].astype(np.int32)
        free_rows, other = [], []
        fixed_pos = []
        for pos, b in enumerate(bodies):
            jn = int(m.body_jntnum[b])
            if jn == 1 and m.jnt_type[int(m.body_jntadr[b])] == 0:
                free_rows.append((pos, b, int(m.body_jntadr[b])))
            elif jn == 0:
                fixed_pos.append(pos)
                other.append((pos, b))
            else:
                other.append((pos, b))
        max_slots = max((int(m.body_jntnum[b]) for _, b in other), default=0)
        slots = []
        for s in range(max_slots):
            rows = [
                (pos, b, int(m.body_jntadr[b]) + s)
                for pos, b in other
                if int(m.body_jntnum[b]) > s
            ]
            h = [r for r in rows if m.jnt_type[r[2]] == 3]
            sl = [r for r in rows if m.jnt_type[r[2]] == 2]
            ba = [r for r in rows if m.jnt_type[r[2]] == 1]
            slots.append((_mk_group(m, h), _mk_group(m, sl), _mk_group(m, ba)))
        levels.append(
            Level(
                bodies=bodies,
                parents=parents,
                free=_mk_group(m, free_rows),
                fixed_pos=np.array(fixed_pos, np.int32),
                slots=tuple(slots),
            )
        )

    jnt_by_type = tuple(
        np.nonzero(np.asarray(m.jnt_type) == t)[0].astype(np.int32)
        for t in range(4)
    )

    # dof suffix mask for cdof_dot: S[d, d'] = 1 if same body and
    # d' >= start of d's joint sub-group (trio for ball/free-rot, self for 1-dof)
    S = np.zeros((nv, nv), np.float64)
    free_trans = np.zeros(nv, bool)
    for j in range(njnt):
        t = int(m.jnt_type[j])
        dadr = int(m.jnt_dofadr[j])
        b = int(m.jnt_bodyid[j])
        body_dofs = np.arange(
            int(m.body_dofadr[b]), int(m.body_dofadr[b]) + int(m.body_dofnum[b])
        )
        if t == 0:  # free
            free_trans[dadr : dadr + 3] = True
            for i in range(3):  # rotation trio
                d = dadr + 3 + i
                S[d, body_dofs[body_dofs >= dadr + 3]] = 1.0
            # translation trio: cdof_dot forced to zero, mask irrelevant
        elif t == 1:  # ball trio
            for i in range(3):
                d = dadr + i
                S[d, body_dofs[body_dofs >= dadr]] = 1.0
        else:
            d = dadr
            S[d, body_dofs[body_dofs >= dadr]] = 1.0

    scalar = [
        j for j in range(njnt) if m.jnt_type[j] in (2, 3)
    ]
    quat_jnt = tuple(
        (int(m.jnt_type[j]), int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j]))
        for j in range(njnt)
        if m.jnt_type[j] in (0, 1)
    )
    # ancestor-or-self closure over the parent chain
    SUB = np.eye(nbody, dtype=np.float64)
    for b in range(1, nbody):
        SUB[:, b] += SUB[:, int(m.body_parentid[b])]
    np.clip(SUB, 0.0, 1.0, out=SUB)

    return Plan(
        levels=tuple(levels),
        jnt_by_type=jnt_by_type,
        body_subtree_mask=SUB,
        dof_suffix_mask=S,
        free_trans_dof=free_trans,
        scalar_qadr=np.asarray(m.jnt_qposadr)[scalar].astype(np.int32),
        scalar_dadr=np.asarray(m.jnt_dofadr)[scalar].astype(np.int32),
        scalar_jid=np.array(scalar, np.int32),
        quat_jnt=quat_jnt,
    )
