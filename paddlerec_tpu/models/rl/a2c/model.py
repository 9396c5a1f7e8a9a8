"""A2C: advantage actor-critic on CartPole.

Parity target: reference models/rl/A2C/train.py:83-205 — a 2-layer
actor (softmax policy) + critic (value), n-step rollouts from a fleet of
environment workers, discounted returns, and
loss = actor + 0.5·critic − 0.001·entropy with 0.92 lr decay every 2000
frames.

TPU-native design: the reference farms env steps out over paddle RPC
workers; here the environments are a VECTORIZED pure-JAX CartPole, so the
whole rollout-collect + loss + update loop is one ``lax.scan`` inside a
single jit — no host↔device ping-pong per step, no RPC.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import ModelDef

# -- CartPole-v0 dynamics (classic control; constants per the gym spec) -----
GRAVITY = 9.8
CART_MASS = 1.0
POLE_MASS = 0.1
TOTAL_MASS = CART_MASS + POLE_MASS
POLE_HALF_LEN = 0.5
POLEMASS_LENGTH = POLE_MASS * POLE_HALF_LEN
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * np.pi / 360
X_LIMIT = 2.4
MAX_STEPS = 200


class EnvState(NamedTuple):
    obs: jnp.ndarray  # (N, 4)
    steps: jnp.ndarray  # (N,)
    key: jnp.ndarray


def env_reset(key, n):
    k1, k2 = jax.random.split(key)
    obs = jax.random.uniform(k1, (n, 4), minval=-0.05, maxval=0.05)
    return EnvState(obs, jnp.zeros((n,), jnp.int32), k2)


def env_step(state: EnvState, action: jnp.ndarray):
    x, x_dot, theta, theta_dot = (
        state.obs[:, 0], state.obs[:, 1], state.obs[:, 2], state.obs[:, 3]
    )
    force = jnp.where(action == 1, FORCE_MAG, -FORCE_MAG)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    temp = (force + POLEMASS_LENGTH * theta_dot**2 * sin_t) / TOTAL_MASS
    theta_acc = (GRAVITY * sin_t - cos_t * temp) / (
        POLE_HALF_LEN * (4.0 / 3.0 - POLE_MASS * cos_t**2 / TOTAL_MASS)
    )
    x_acc = temp - POLEMASS_LENGTH * theta_acc * cos_t / TOTAL_MASS
    obs = jnp.stack(
        [
            x + TAU * x_dot,
            x_dot + TAU * x_acc,
            theta + TAU * theta_dot,
            theta_dot + TAU * theta_acc,
        ],
        axis=1,
    )
    steps = state.steps + 1
    done = (
        (jnp.abs(obs[:, 0]) > X_LIMIT)
        | (jnp.abs(obs[:, 2]) > THETA_LIMIT)
        | (steps >= MAX_STEPS)
    )
    reward = jnp.ones_like(obs[:, 0])
    # auto-reset finished envs (rpc_step resets on done, train.py:41-46)
    key, sub = jax.random.split(state.key)
    fresh = jax.random.uniform(sub, obs.shape, minval=-0.05, maxval=0.05)
    obs = jnp.where(done[:, None], fresh, obs)
    steps = jnp.where(done, 0, steps)
    return EnvState(obs, steps, key), reward, done


class ActorCritic(nn.Module):
    num_actions: int = 2
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        value = nn.Dense(1, name="critic_out")(
            nn.relu(nn.Dense(self.hidden, name="critic_fc")(x))
        )[..., 0]
        logits = nn.Dense(self.num_actions, name="actor_out")(
            nn.relu(nn.Dense(self.hidden, name="actor_fc")(x))
        )
        return logits, value


@register_model("rl.a2c")
class ModelDef(ModelDef):
    metrics = "none"
    metric_names = ()

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.num_steps = int(h("num_steps", 5))
        self.num_envs = int(h("num_envs", 16))
        self.gamma = float(h("gamma", 0.99))
        self.hidden = int(h("hidden_size", 256))
        self.module = ActorCritic(2, self.hidden)

    def _base_optimizer(self):
        lr = float(self.config.hyper("optimizer.learning_rate", 1e-3))
        # 0.92 decay every 2000 frames (train.py:196-198)
        sched = optax.exponential_decay(
            lr, transition_steps=2000 // self.num_steps, decay_rate=0.92
        )
        return optax.adam(sched)

    def model_inputs(self, batch):
        return (batch["obs"],)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {"obs": rng.randn(batch_size, 4).astype(np.float32)}

    # -- the fused rollout+loss step --------------------------------------
    def rollout_loss(self, params, env_state: EnvState, key):
        """Collect num_steps transitions under the current policy and
        return (loss, (new_env_state, mean_reward))."""

        def policy(obs):
            return self.module.apply({"params": params}, obs)

        def step(carry, k):
            env = carry
            logits, value = policy(env.obs)
            action = jax.random.categorical(k, logits)
            logp = jax.nn.log_softmax(logits)
            log_prob = jnp.take_along_axis(
                logp, action[:, None], 1
            )[:, 0]
            entropy = -(jax.nn.softmax(logits) * logp).sum(-1).mean()
            new_env, reward, done = env_step(env, action)
            return new_env, (log_prob, value, reward, 1.0 - done, entropy)

        keys = jax.random.split(key, self.num_steps)
        env_state, (log_probs, values, rewards, masks, entropies) = (
            jax.lax.scan(step, env_state, keys)
        )
        _, next_value = policy(env_state.obs)

        def disc(r_next, inp):
            r, m = inp
            r_cur = r + self.gamma * r_next * m
            return r_cur, r_cur

        _, returns = jax.lax.scan(
            disc, next_value, (rewards, masks), reverse=True
        )
        advantage = returns - values
        actor_loss = -(log_probs * jax.lax.stop_gradient(advantage)).mean()
        critic_loss = (advantage**2).mean()
        entropy = entropies.sum()
        loss = actor_loss + 0.5 * critic_loss - 0.001 * entropy
        return loss, (env_state, rewards.mean())

    def train_forward(self, params, batch):
        # generic contract (for the smoke harness): value regression to 0
        logits, value = self.module.apply({"params": params}, batch["obs"])
        return (value**2).mean(), {"logits": logits}

    def train(self, total_frames: int = 20000, seed: int = 0, log_every=2000):
        """Self-contained A2C training loop (the train.py analog)."""
        key = jax.random.PRNGKey(seed)
        key, k1, k2 = jax.random.split(key, 3)
        params = self.module.init(k1, jnp.zeros((1, 4)))["params"]
        tx = self.create_optimizer()
        opt_state = tx.init(params)
        env_state = env_reset(k2, self.num_envs)

        @jax.jit
        def update(params, opt_state, env_state, k):
            (loss, (env_state, mean_r)), grads = jax.value_and_grad(
                self.rollout_loss, has_aux=True
            )(params, env_state, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (
                optax.apply_updates(params, updates), opt_state, env_state,
                loss, mean_r,
            )

        frames = 0
        history = []
        while frames < total_frames:
            key, k = jax.random.split(key)
            params, opt_state, env_state, loss, mean_r = update(
                params, opt_state, env_state, k
            )
            frames += self.num_steps * self.num_envs
            if frames % log_every < self.num_steps * self.num_envs:
                history.append(self.evaluate_policy(params, key))
        return params, history

    def evaluate_policy(self, params, key, episodes: int = 4) -> float:
        """Mean greedy-episode return (test_env, train.py:117-134)."""
        env = env_reset(key, episodes)
        total = jnp.zeros((episodes,))
        alive = jnp.ones((episodes,), bool)

        def body(carry, _):
            env, total, alive = carry
            logits, _ = self.module.apply({"params": params}, env.obs)
            action = logits.argmax(-1)
            env, reward, done = env_step(env, action)
            total = total + reward * alive
            alive = alive & ~done
            return (env, total, alive), None

        (env, total, alive), _ = jax.lax.scan(
            body, (env, total, alive), None, length=MAX_STEPS
        )
        return float(total.mean())
