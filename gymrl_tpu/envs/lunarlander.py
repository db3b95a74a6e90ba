"""Pure-JAX LunarLander engine (gymnasium LunarLander-v2/v3 semantics).

The reference trains PPO (and all its variants) on gymnasium's Box2D lander
(e.g. algorithms/ppo_lunarlander.py:160). This engine re-creates those
dynamics as a single fused XLA program so thousands of landers step in
lockstep on TPU: no Box2D, no host physics.

Fidelity model
--------------
Gymnasium's lander is a Box2D world: a 6-vertex lander polygon (density 5)
with two box legs (density 1) on motorized revolute joints, jagged random
terrain with a flat helipad, engine impulses with dispersion noise, and an
impulse contact solver. We reproduce:

  * **Exact scalar constants** — FPS=50, SCALE=30, engine powers 13/0.6,
    initial random force ±1000, viewport 600x400, observation scaling,
    reward shaping, fuel costs (0.30/0.03), ±100 terminal rewards, and the
    terrain generator (11 chunks, U(0, H/2) heights, helipad flattening,
    0.33-moving-average smoothing including the Python `height[-1]`
    wraparound quirk).
  * **Exact rigid-body constants**, extracted from Box2D's mass calculator:
    the lander fixture has mass 4.81667, I_com 0.83331, COM (0, 0.10131);
    each leg 0.071111 kg. In flight the leg joints sit pinned at their
    ±0.4 rad stops (motor torque 40 vs. gram-scale gravity torque), so we
    treat the assembly as ONE rigid body: M=4.95889, COM (0, 0.09840),
    I=0.90152 about the combined COM.
  * **Exact engine impulse formulas** including dispersion noise geometry
    (main: offset 4/SCALE + 2·disp0 along -tip, side: the
    17-vs-SIDE_ENGINE_HEIGHT=14 asymmetry quirk that produces
    orientation-dependent torque).
  * **Box2D's integrator order**: impulses → v += g·dt → contact velocity
    solve → x += v·dt → positional correction (Baumgarte 0.2, slop 5 mm).
  * **Sleep semantics** for the +100 reward: linear vel < 0.01, angular
    vel < 2°/s sustained for 0.5 s ⇒ asleep ⇒ terminated, +100.
  * **Wind/turbulence** (v3 options, default off) with the same
    tanh(sin(2kx)+sin(πkx)) pseudo-noise and integer index walk.

The deliberate approximation: leg joints do not flex on touchdown (Box2D
lets them compress against the 40 N·m motor). Contact resolves on the 4
leg-corner points with Box2D-style accumulated sequential impulses
(restitution 0, mixed friction √(0.1·0.2), accumulated-clamp friction
cone); hull contact terminates immediately (game_over, like gymnasium's
ContactDetector) and therefore needs no impulse resolution. Free flight
matches gymnasium to numerical tolerance, wind/turbulence to fitted
joint-flex constants, and touchdown statistically: gymnasium's own
heuristic controller lands 92% here vs 98% on Box2D over 48 seeds with
matching return distributions (see tests/test_lunarlander.py). The
residual gap is the suspension stiffness, within the seed-to-seed
variance the curve-parity target allows (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit

# -- Scalar constants (gymnasium lunar_lander.py values) ----------------------
FPS = 50.0
DT = 1.0 / FPS
SCALE = 30.0
MAIN_ENGINE_POWER = 13.0
SIDE_ENGINE_POWER = 0.6
INITIAL_RANDOM = 1000.0
SIDE_ENGINE_HEIGHT = 14.0
SIDE_ENGINE_AWAY = 12.0
MAIN_ENGINE_Y_LOCATION = 4.0
VIEWPORT_W, VIEWPORT_H = 600.0, 400.0
W = VIEWPORT_W / SCALE  # 20.0
H = VIEWPORT_H / SCALE  # 13.3333
CHUNKS = 11
HELIPAD_Y = H / 4.0
LEG_DOWN = 18.0 / SCALE

# -- Rigid-body constants (extracted from Box2D's mass computation) -----------
BODY_MASS = 4.9588888  # lander fixture + 2 legs
COM_LOCAL = jnp.array([0.0, 0.09840133])  # combined COM in lander frame
BODY_INERTIA = 0.90152451  # about combined COM

# Wind response constants. Gymnasium applies the wind force/torque to the
# HULL body only (ApplyForceToCenter/ApplyTorque, lunar_lander.py:485-506);
# the legs follow through their motorized joints, which flex slightly, so
# the assembly's measured response differs from the rigid-body prediction:
# effective inertia 0.92 (vs 0.9015 rigid) and the horizontal wind force
# acts with an effective lever ~11 mm above the assembly COM (vs 2.9 mm to
# the hull COM). Both fitted to Box2D free-flight traces (3 seeds, 40 steps,
# max angle error 0.0017 rad; see tests/test_lunarlander.py wind oracle).
WIND_INERTIA = 0.92
WIND_TORQUE_LEVER = 0.011

# Lander hull vertices in lander frame (crash contact points).
HULL_PTS = np.array(
    [(-14, 17), (-17, 0), (-17, -10), (17, -10), (17, 0), (14, 17)], np.float32
) / SCALE

# Leg bottom corners in lander frame with joints pinned at their stops
# (relative angle +0.4 for the +x leg, -0.4 for the -x leg); computed from
# the joint geometry: leg anchor (±20/30, 18/30) in leg frame pinned to the
# lander origin, box half-extents (2/30, 8/30).
def _leg_corners() -> np.ndarray:
    pts = []
    for i, rel in ((-1, +0.4), (+1, -0.4)):
        c, s = np.cos(rel), np.sin(rel)
        rot = np.array([[c, -s], [s, c]])
        anchor = np.array([i * 20.0 / SCALE, 18.0 / SCALE])
        center = -rot @ anchor
        for corner in (np.array([-2.0 / SCALE, -8.0 / SCALE]),
                       np.array([2.0 / SCALE, -8.0 / SCALE])):
            pts.append(center + rot @ corner)
    return np.array(pts, np.float32)


LEG_PTS = _leg_corners()  # [4, 2]; rows 0-1 = +x leg, 2-3 = -x leg

CONTACT_FRICTION = float(np.sqrt(0.1 * 0.2))  # Box2D mixes √(ground·leg)
# Gauss-Seidel velocity-solve sweeps over the 4 leg corners. Box2D runs
# gymnasium's world.Step with 6·30=180 velocity iterations; 10 sweeps
# already converge the 4-point problem (landing-distribution oracle tests
# pass). Module-level so profiling harnesses can vary it.
SOLVER_SWEEPS = 10
BAUMGARTE = 0.2
LINEAR_SLOP = 0.005
SLEEP_LIN_TOL = 0.01  # m/s (b2_linearSleepTolerance)
SLEEP_ANG_TOL = 2.0 / 180.0 * np.pi  # rad/s (b2_angularSleepTolerance)
TIME_TO_SLEEP = 0.5  # s


class LunarLanderParams(NamedTuple):
    gravity: jax.Array  # f32[] — default -10
    enable_wind: jax.Array  # bool[]
    wind_power: jax.Array  # f32[] — default 15
    turbulence_power: jax.Array  # f32[] — default 1.5
    dispersion_scale: jax.Array  # f32[] — 1.0; tests zero it for determinism


class LunarLanderState(NamedTuple):
    pos: jax.Array  # f32[2] — lander body origin (not COM), world frame
    vel: jax.Array  # f32[2]
    angle: jax.Array  # f32[]
    omega: jax.Array  # f32[]
    terrain: jax.Array  # f32[CHUNKS] — smoothed chunk heights
    prev_shaping: jax.Array  # f32[]
    sleep_time: jax.Array  # f32[] — seconds below sleep tolerance
    wind_idx: jax.Array  # i32[]
    torque_idx: jax.Array  # i32[]
    leg_contact: jax.Array  # bool[2] — (+x leg, -x leg) ... obs order fixed below
    t: jax.Array  # i32[]


def _rot(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def _segment_lookup(terrain: jax.Array, x: jax.Array):
    """(t0, t1, frac) of the terrain segment under world x.

    Uses a one-hot contraction over the CHUNKS axis instead of a dynamic
    gather: under vmap, `terrain[i0]` lowers to a per-env gather, which on
    TPU is an order of magnitude slower than an 11-wide masked reduction
    (the gathers were ~40% of the whole rollout phase — PROFILE_r3.md).
    Bit-identical to the indexed form.
    """
    dx = W / (CHUNKS - 1)
    xi = jnp.clip(x / dx, 0.0, CHUNKS - 1 - 1e-6)
    i0 = jnp.floor(xi).astype(jnp.int32)
    frac = xi - i0
    idx = jnp.arange(CHUNKS, dtype=jnp.int32)
    onehot = (idx == i0[..., None]).astype(terrain.dtype)  # [..., CHUNKS]
    t0 = jnp.sum(terrain * onehot, axis=-1)
    t1 = jnp.sum(jnp.roll(terrain, -1) * onehot, axis=-1)  # terrain[i0+1]
    return t0, t1, frac


def _terrain_height(terrain: jax.Array, x: jax.Array) -> jax.Array:
    """Piecewise-linear ground height at world x (chunk_x[i] = W/(CHUNKS-1)·i).

    Accepts scalar or vector ``x``.
    """
    t0, t1, frac = _segment_lookup(terrain, x)
    return t0 * (1.0 - frac) + t1 * frac


def _terrain_normal(terrain: jax.Array, x: jax.Array) -> jax.Array:
    """Unit normal(s) of the terrain segment under x (scalar or [N] x)."""
    dx = W / (CHUNKS - 1)
    t0, t1, _ = _segment_lookup(terrain, x)
    slope = (t1 - t0) / dx
    n = jnp.stack([-slope, jnp.ones_like(slope)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


class LunarLander(Env):
    """Discrete 4-action lander; ``continuous=True`` gives the Box(2) variant."""

    name = "LunarLander-v3"
    obs_shape = (8,)
    max_steps = 1000

    def __init__(self, continuous: bool = False, enable_wind: bool = False,
                 gravity: float = -10.0, wind_power: float = 15.0,
                 turbulence_power: float = 1.5):
        self.continuous = continuous
        if continuous:
            self.n_actions = None
            self.act_dim = 2
            self.action_bound = 1.0
        else:
            self.n_actions = 4
        self._init_params = LunarLanderParams(
            gravity=jnp.asarray(gravity, jnp.float32),
            enable_wind=jnp.asarray(enable_wind),
            wind_power=jnp.asarray(wind_power, jnp.float32),
            turbulence_power=jnp.asarray(turbulence_power, jnp.float32),
            dispersion_scale=jnp.asarray(1.0, jnp.float32),
        )

    def default_params(self) -> LunarLanderParams:
        return self._init_params

    def __hash__(self):
        return hash((type(self).__name__, self.name, self.continuous))

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.continuous == other.continuous
            and self.name == other.name
        )

    # -- observation / shaping -------------------------------------------------
    def _obs(self, state: LunarLanderState) -> jax.Array:
        return jnp.array(
            [
                (state.pos[0] - W / 2.0) / (W / 2.0),
                (state.pos[1] - (HELIPAD_Y + LEG_DOWN)) / (H / 2.0),
                state.vel[0] * (W / 2.0) / FPS,
                state.vel[1] * (H / 2.0) / FPS,
                state.angle,
                20.0 * state.omega / FPS,
                state.leg_contact[0].astype(jnp.float32),
                state.leg_contact[1].astype(jnp.float32),
            ],
            jnp.float32,
        )

    @staticmethod
    def _shaping(obs: jax.Array) -> jax.Array:
        return (
            -100.0 * jnp.sqrt(obs[0] ** 2 + obs[1] ** 2)
            - 100.0 * jnp.sqrt(obs[2] ** 2 + obs[3] ** 2)
            - 100.0 * jnp.abs(obs[4])
            + 10.0 * obs[6]
            + 10.0 * obs[7]
        )

    # -- reset -----------------------------------------------------------------
    def reset(self, params: LunarLanderParams, key):
        k_terrain, k_force, k_wind, k_torque, k_step = jax.random.split(key, 5)

        # Terrain: heights U(0, H/2) at CHUNKS+1 points; helipad chunks
        # flattened; 0.33-moving-average smoothing with the height[-1]
        # wraparound quirk of the reference implementation.
        height = jax.random.uniform(k_terrain, (CHUNKS + 1,), jnp.float32, 0.0, H / 2.0)
        pad = jnp.arange(CHUNKS + 1)
        is_pad = (pad >= CHUNKS // 2 - 2) & (pad <= CHUNKS // 2 + 2)
        height = jnp.where(is_pad, HELIPAD_Y, height)
        prev = jnp.roll(height, 1)[:CHUNKS]  # height[i-1], i=0 → height[-1]=height[11]
        nxt = height[1:CHUNKS + 1]
        smooth = 0.33 * (prev + height[:CHUNKS] + nxt)

        # Initial body: top-center, zero velocity, then one internal step with
        # the ±INITIAL_RANDOM force applied (gymnasium reset ends with step(0)).
        force = jax.random.uniform(k_force, (2,), jnp.float32, -INITIAL_RANDOM, INITIAL_RANDOM)
        state = LunarLanderState(
            pos=jnp.array([W / 2.0, H], jnp.float32),
            vel=force * (DT / BODY_MASS),  # v += dt·F/m happens in the reset step
            angle=jnp.zeros(()),
            omega=jnp.zeros(()),
            terrain=smooth,
            prev_shaping=jnp.zeros(()),
            sleep_time=jnp.zeros(()),
            wind_idx=jax.random.randint(k_wind, (), -9999, 9999),
            torque_idx=jax.random.randint(k_torque, (), -9999, 9999),
            leg_contact=jnp.zeros((2,), bool),
            t=jnp.zeros((), jnp.int32),
        )
        noop = jnp.zeros((2,), jnp.float32) if self.continuous else jnp.zeros((), jnp.int32)
        # contacts=False: the lander spawns at the viewport top (y=H) and the
        # terrain tops out below H/2+smoothing, so ground contact in the reset
        # step is geometrically impossible — skipping the contact solver /
        # hull check / leg flags is exact, and it matters because VecEnv's
        # autoreset evaluates reset() for the whole batch on EVERY rollout
        # step (the solver would otherwise run twice per env-step).
        result = self._physics_step(params, state, noop, k_step, contacts=False)
        st = result.state._replace(t=jnp.zeros((), jnp.int32))
        return st, result.obs

    # -- step ------------------------------------------------------------------
    def step(self, params: LunarLanderParams, state: LunarLanderState, action, key) -> StepResult:
        return self._physics_step(params, state, action, key)

    def _physics_step(self, params, state: LunarLanderState, action, key,
                      contacts: bool = True) -> StepResult:
        k_disp = key
        pos, vel, angle, omega = state.pos, state.vel, state.angle, state.omega
        wind_idx, torque_idx = state.wind_idx, state.torque_idx

        # Wind + turbulence (applied as forces; only when no leg touches).
        airborne = jnp.logical_not(jnp.any(state.leg_contact))
        use_wind = params.enable_wind & airborne
        wind_mag = jnp.tanh(
            jnp.sin(0.02 * wind_idx.astype(jnp.float32))
            + jnp.sin(jnp.pi * 0.01 * wind_idx.astype(jnp.float32))
        ) * params.wind_power
        torque_mag = jnp.tanh(
            jnp.sin(0.02 * torque_idx.astype(jnp.float32))
            + jnp.sin(jnp.pi * 0.01 * torque_idx.astype(jnp.float32))
        ) * params.turbulence_power
        vel = vel + jnp.where(use_wind, DT * wind_mag / BODY_MASS, 0.0) * jnp.array([1.0, 0.0])
        wind_torque = torque_mag - WIND_TORQUE_LEVER * jnp.cos(angle) * wind_mag
        omega = omega + jnp.where(use_wind, DT * wind_torque / WIND_INERTIA, 0.0)
        wind_idx = wind_idx + jnp.where(use_wind, 1, 0)
        torque_idx = torque_idx + jnp.where(use_wind, 1, 0)

        # Engine throttles.
        if self.continuous:
            a = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
            main_on = a[0] > 0.0
            m_power = jnp.where(main_on, (jnp.clip(a[0], 0.0, 1.0) + 1.0) * 0.5, 0.0)
            side_on = jnp.abs(a[1]) > 0.5
            direction = jnp.sign(a[1])
            s_power = jnp.where(side_on, jnp.clip(jnp.abs(a[1]), 0.5, 1.0), 0.0)
        else:
            a = jnp.asarray(action, jnp.int32)
            m_power = jnp.where(a == 2, 1.0, 0.0)
            side_on = (a == 1) | (a == 3)
            direction = jnp.where(side_on, a.astype(jnp.float32) - 2.0, 0.0)
            s_power = jnp.where(side_on, 1.0, 0.0)

        tip = jnp.array([jnp.sin(angle), jnp.cos(angle)])
        side = jnp.array([-tip[1], tip[0]])
        disp = (
            jax.random.uniform(k_disp, (2,), jnp.float32, -1.0, 1.0)
            / SCALE
            * params.dispersion_scale
        )

        com_world = pos + _rot(angle) @ COM_LOCAL

        def apply_impulse(vel, omega, impulse, point):
            vel = vel + impulse / BODY_MASS
            r = point - com_world
            omega = omega + (r[0] * impulse[1] - r[1] * impulse[0]) / BODY_INERTIA
            return vel, omega

        # Main engine (gymnasium's exact offset geometry incl. noise terms).
        ox_m = tip[0] * (MAIN_ENGINE_Y_LOCATION / SCALE + 2.0 * disp[0]) + side[0] * disp[1]
        oy_m = -tip[1] * (MAIN_ENGINE_Y_LOCATION / SCALE + 2.0 * disp[0]) - side[1] * disp[1]
        o_m = jnp.array([ox_m, oy_m])
        vel, omega = apply_impulse(
            vel, omega, -o_m * MAIN_ENGINE_POWER * m_power, pos + o_m
        )

        # Side engines — note the 17-vs-14 height asymmetry quirk preserved.
        ox_s = tip[0] * disp[0] + side[0] * (3.0 * disp[1] + direction * SIDE_ENGINE_AWAY / SCALE)
        oy_s = -tip[1] * disp[0] - side[1] * (3.0 * disp[1] + direction * SIDE_ENGINE_AWAY / SCALE)
        o_s = jnp.array([ox_s, oy_s])
        impulse_pos_s = jnp.array(
            [pos[0] + ox_s - tip[0] * 17.0 / SCALE,
             pos[1] + oy_s + tip[1] * SIDE_ENGINE_HEIGHT / SCALE]
        )
        vel, omega = apply_impulse(
            vel, omega, -o_s * SIDE_ENGINE_POWER * s_power, impulse_pos_s
        )

        # Gravity (Box2D: v += dt·g before the contact velocity solve).
        vel = vel + jnp.array([0.0, DT * params.gravity])

        if contacts:
            # Contact velocity solve — sequential impulses (Gauss-Seidel) over
            # the 4 LEG corner points only. Hull-ground contact terminates the
            # episode (game_over, exactly like gymnasium's ContactDetector), so
            # the hull never needs impulse resolution — that cuts the solver
            # from 10 points to 4 and the sequential depth from 80 to 24 rounds.
            # The 24 rounds are fully unrolled (Python loop, tiny elementwise
            # bodies): no scan per-iteration overhead, XLA fuses the chain.
            rot = _rot(angle)
            leg_pts_w = pos[None, :] + (LEG_PTS @ rot.T)  # [4, 2]
            leg_ground_s = _terrain_height(state.terrain, leg_pts_w[:, 0])
            leg_normals = _terrain_normal(state.terrain, leg_pts_w[:, 0])
            touching = (leg_ground_s - leg_pts_w[:, 1]) > 0.0

            r_pts = leg_pts_w - com_world  # [4, 2]
            n_vec = leg_normals
            t_all = jnp.stack([n_vec[:, 1], -n_vec[:, 0]], axis=-1)
            rn_all = r_pts[:, 0] * n_vec[:, 1] - r_pts[:, 1] * n_vec[:, 0]
            rt_all = r_pts[:, 0] * t_all[:, 1] - r_pts[:, 1] * t_all[:, 0]
            k_n_all = 1.0 / BODY_MASS + rn_all * rn_all / BODY_INERTIA
            k_t_all = 1.0 / BODY_MASS + rt_all * rt_all / BODY_INERTIA

            def apply_impulse_local(vel, omega, impulse, r):
                vel = vel + impulse / BODY_MASS
                omega = omega + (r[0] * impulse[1] - r[1] * impulse[0]) / BODY_INERTIA
                return vel, omega

            # Sequential impulses with ACCUMULATED-impulse clamping (Box2D's
            # scheme): per point, the total normal impulse stays ≥ 0 and the
            # total friction impulse stays inside μ·λ_n_total. Clamping each
            # sweep's increment alone (the naive variant) over-brakes — a
            # lander on a slope just beyond the friction cone then creeps at
            # ~0.04 m/s instead of sliding down to flat ground and sleeping,
            # which starves the +100 landing reward off-pad.
            acc_n = [jnp.zeros(()) for _ in range(LEG_PTS.shape[0])]
            acc_t = [jnp.zeros(()) for _ in range(LEG_PTS.shape[0])]
            for _ in range(SOLVER_SWEEPS):  # GS sweeps × 4 points, unrolled
                for i in range(LEG_PTS.shape[0]):
                    n = n_vec[i]
                    r = r_pts[i]
                    u = vel + omega * jnp.array([-1.0, 1.0]) * r[::-1]
                    vn = u @ n
                    d_n = jnp.where(touching[i], -vn / k_n_all[i], 0.0)
                    new_n = jnp.maximum(acc_n[i] + d_n, 0.0)
                    d_n = new_n - acc_n[i]
                    acc_n[i] = new_n
                    vel, omega = apply_impulse_local(vel, omega, d_n * n, r)
                    t_v = t_all[i]
                    u = vel + omega * jnp.array([-1.0, 1.0]) * r[::-1]
                    vt = u @ t_v
                    d_t = jnp.where(touching[i], -vt / k_t_all[i], 0.0)
                    hi = CONTACT_FRICTION * acc_n[i]
                    new_t = jnp.clip(acc_t[i] + d_t, -hi, hi)
                    d_t = new_t - acc_t[i]
                    acc_t[i] = new_t
                    vel, omega = apply_impulse_local(vel, omega, d_t * t_v, r)

        # Integrate positions (semi-implicit Euler, Box2D order).
        pos = pos + DT * vel
        angle = angle + DT * omega

        if contacts:
            # Positional correction (Baumgarte split-impulse analogue): push the
            # body out along the deepest LEG contact normal (hull contact is a
            # crash, never resolved).
            rot2 = _rot(angle)
            pts2 = pos[None, :] + (LEG_PTS @ rot2.T)
            ground2 = _terrain_height(state.terrain, pts2[:, 0])
            pen2 = ground2 - pts2[:, 1]
            # one-hot select of the deepest point (dynamic indexing would be
            # a per-env gather under vmap — see _segment_lookup)
            deep_oh = (jnp.arange(pen2.shape[0]) == jnp.argmax(pen2)).astype(pen2.dtype)
            pen_deep = jnp.sum(pen2 * deep_oh)
            x_deep = jnp.sum(pts2[:, 0] * deep_oh)
            corr = BAUMGARTE * jnp.maximum(pen_deep - LINEAR_SLOP, 0.0)
            n_deep = _terrain_normal(state.terrain, x_deep)
            pos = pos + jnp.clip(corr, 0.0, 0.2) * n_deep

            # Contact flags after integration (for obs + next-step wind gating).
            rot3 = _rot(angle)
            leg_world = pos[None, :] + (LEG_PTS @ rot3.T)
            leg_ground = _terrain_height(state.terrain, leg_world[:, 0])
            leg_touch = (leg_ground - leg_world[:, 1]) > -LINEAR_SLOP
            # obs order: legs[0] is the i=-1 leg (at +x), legs[1] the i=+1 leg.
            leg_contact = jnp.array(
                [leg_touch[0] | leg_touch[1], leg_touch[2] | leg_touch[3]]
            )

            hull_world = pos[None, :] + (HULL_PTS @ rot3.T)
            hull_ground = _terrain_height(state.terrain, hull_world[:, 0])
            body_hit = jnp.any(hull_ground - hull_world[:, 1] > 0.0)
        else:
            # Reset-time step: the body is far above the terrain's maximum
            # possible height, so no contact, no crash, no leg flags.
            leg_contact = jnp.zeros((2,), bool)
            body_hit = jnp.zeros((), bool)

        # Sleep bookkeeping (+100 landing detection).
        quiet = (jnp.linalg.norm(vel) < SLEEP_LIN_TOL) & (jnp.abs(omega) < SLEEP_ANG_TOL)
        sleep_time = jnp.where(quiet, state.sleep_time + DT, 0.0)
        asleep = sleep_time >= TIME_TO_SLEEP

        t = state.t + 1
        new_state = LunarLanderState(
            pos=pos, vel=vel, angle=angle, omega=omega,
            terrain=state.terrain, prev_shaping=state.prev_shaping,
            sleep_time=sleep_time, wind_idx=wind_idx, torque_idx=torque_idx,
            leg_contact=leg_contact, t=t,
        )
        obs = self._obs(new_state)
        shaping = self._shaping(obs)
        reward = shaping - state.prev_shaping - m_power * 0.30 - s_power * 0.03
        new_state = new_state._replace(prev_shaping=shaping)

        crashed = body_hit | (jnp.abs(obs[0]) >= 1.0)
        terminated = crashed | asleep
        reward = jnp.where(crashed, -100.0, jnp.where(asleep, 100.0, reward))
        truncated = time_limit(t, self.max_steps, terminated)
        return StepResult(new_state, obs, reward.astype(jnp.float32), terminated, truncated)
