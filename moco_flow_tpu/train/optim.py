"""Optimizers and LR schedules on optax.

Parity surface with the reference factories (trainer/base.py:122-160):
optimizers sgd / adam / radam / ranger (Ranger = RAdam + Lookahead,
utils/optimizers.py:266-405) and schedulers steplr / explr / cosine / poly.
The reference steps its scheduler every *iteration* and divides steplr
milestones by world_size (base.py:147, train.py:73); here schedules are pure
functions of the global step with the same milestone scaling.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params
    nu: optax.Params


def scale_by_radam_ref(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                       threshold: float = 5.0,
                       strict_threshold: bool = False
                       ) -> optax.GradientTransformation:
    """Reference-exact RAdam rescaling (utils/optimizers.py:59-93).

    Differs from optax.scale_by_radam in two ways that matter for parity:
      - eps is added to sqrt(nu) (the RAW second moment) with sqrt(1-b2^t)
        folded into the step size — the reference formula — instead of to
        the bias-corrected sqrt(nu_hat);
      - 1-b2^t is computed via expm1, because at the production b2=0.999
        the f32 cancellation (1 - 0.995...) perturbs N_sma by ~0.03 right
        where it crosses the rectification threshold (N_sma(5)=4.98), which
        flips the branch at step 5 vs the reference's float64 host math.

    ``strict_threshold`` selects Ranger's ``N_sma > 5`` comparison
    (utils/optimizers.py:381) over RAdam's ``>= 5`` (:74).
    """
    ro_inf = 2.0 / (1.0 - b2) - 1.0
    log_b1, log_b2 = math.log(b1), math.log(b2)

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return RAdamState(jnp.zeros((), jnp.int32),
                          jax.tree.map(z, params), jax.tree.map(z, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        t = count.astype(jnp.float32)
        b2t = jnp.exp(t * log_b2)
        one_minus_b2t = -jnp.expm1(t * log_b2)
        bc1 = -jnp.expm1(t * log_b1)  # 1 - b1^t
        ro = ro_inf - 2.0 * t * b2t / one_minus_b2t
        rect_size = jnp.sqrt(
            one_minus_b2t * (ro - 4.0) / (ro_inf - 4.0)
            * (ro - 2.0) / ro * ro_inf / (ro_inf - 2.0)) / bc1
        degen_size = 1.0 / bc1
        rectified = (ro > threshold) if strict_threshold else (ro >= threshold)

        def one(m, v):
            return jnp.where(rectified,
                             rect_size * m / (jnp.sqrt(v) + eps),
                             degen_size * m)

        return jax.tree.map(one, mu, nu), RAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper keeping slow weights inside the optimizer state
    (k=6, alpha=0.5 — the reference Ranger defaults,
    utils/optimizers.py:273)."""

    def init(params):
        return LookaheadState(inner.init(params), params, jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = count % sync_period == 0

        def on_sync(args):
            upd, slow = args
            fast = jax.tree.map(lambda p, u: p + u, params, upd)
            new_slow = jax.tree.map(
                lambda s, f: s + slow_step_size * (f - s), slow, fast)
            # emit the update that lands params exactly on the new slow weights
            return jax.tree.map(lambda ns, p: ns - p, new_slow, params), new_slow

        def no_sync(args):
            upd, slow = args
            return upd, slow

        updates, slow = jax.lax.cond(sync, on_sync, no_sync,
                                     (updates, state.slow))
        return updates, LookaheadState(inner_state, slow, count)

    return optax.GradientTransformation(init, update)


class AdamWWarmupState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params
    nu: optax.Params


def adamw_warmup(learning_rate, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 warmup: int = 0) -> optax.GradientTransformation:
    """The reference's custom AdamW (utils/optimizers.py:173-244): Adam with
    decoupled weight decay AND a linear LR warmup baked into the step —
    ``slr = 1e-8 + t*lr/warmup`` for ``t < warmup`` — where both the decay
    term and the Adam step are scaled by the warmed-up LR."""

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return AdamWWarmupState(jnp.zeros((), jnp.int32),
                                jax.tree.map(z, params),
                                jax.tree.map(z, params))

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        t = count.astype(jnp.float32)
        slr = jnp.where(t < warmup, 1e-8 + t * lr / max(warmup, 1), lr) \
            if warmup else lr
        step_size = slr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        upd = jax.tree.map(
            lambda m, v, p: -step_size * m / (jnp.sqrt(v) + eps)
            - weight_decay * slr * p,
            mu, nu, params)
        return upd, AdamWWarmupState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def make_schedule(scheduler_config: dict | None, base_lr: float,
                  world_size: int = 1):
    """LR as a pure function of the global step (ref base.py:142-160)."""
    if scheduler_config is None:
        return base_lr
    kind = scheduler_config["type"]
    if kind == "steplr":
        milestones = [int(s) // world_size for s in scheduler_config["decay_step"]]
        gamma = scheduler_config["decay_gamma"]
        return optax.piecewise_constant_schedule(
            base_lr, {m: gamma for m in milestones})
    if kind == "explr":
        return lambda step: base_lr * scheduler_config["lr_decay"] ** step
    if kind == "cosine":
        t_max = scheduler_config["num_epochs"]
        eps = 1e-8
        return lambda step: eps + (base_lr - eps) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.minimum(step, t_max) / t_max))
    if kind == "poly":
        n = scheduler_config["num_epochs"]
        p = scheduler_config["poly_exp"]
        return lambda step: base_lr * (1 - jnp.minimum(step, n) / n) ** p
    raise NotImplementedError(f"scheduler type {kind} not implemented")


def make_optimizer(optimizer_config: dict, scheduler_config: dict | None = None,
                   world_size: int = 1) -> optax.GradientTransformation:
    """Optimizer factory (ref base.py:122-140). ``learning_rate`` may be a
    schedule; optax re-evaluates it each step (== per-iteration scheduler
    stepping, ref train.py:73)."""
    kind = optimizer_config["type"]
    lr = make_schedule(scheduler_config, optimizer_config["lr"], world_size)
    wd = optimizer_config.get("weight_decay", 0) or 0
    eps = 1e-8
    if kind == "sgd":
        opt = optax.sgd(lr, momentum=optimizer_config.get("momentum", 0.0))
        if wd:
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
        return opt
    if kind == "adam":
        if wd:
            return optax.adamw(lr, eps=eps, weight_decay=wd)
        return optax.adam(lr, eps=eps)
    if kind == "adamw":
        return adamw_warmup(lr, eps=eps, weight_decay=wd,
                            warmup=int(optimizer_config.get("warmup", 0)))
    if kind == "radam":
        # decay placement matches the reference RAdam (utils/optimizers.py:
        # 84-87): p -= wd*lr*p decoupled from the rescaled adam step, i.e.
        # added to the update AFTER rectified rescaling, not to the gradient
        return optax.chain(
            scale_by_radam_ref(eps=eps),
            *( [optax.add_decayed_weights(wd)] if wd else [] ),
            optax.scale_by_learning_rate(lr))
    if kind == "ranger":
        # reference Ranger hyperparameters (utils/optimizers.py:268): inner
        # RAdam with betas=(0.95, 0.999), eps=1e-5, strict N_sma threshold 5,
        # decoupled -wd*lr*p decay; Lookahead k=6, alpha=0.5
        inner = optax.chain(
            scale_by_radam_ref(b1=0.95, b2=0.999, eps=1e-5,
                               strict_threshold=True),
            *( [optax.add_decayed_weights(wd)] if wd else [] ),
            optax.scale_by_learning_rate(lr))
        return lookahead(inner)
    raise NotImplementedError(f"optimizer type {kind} not implemented")


def zero_grads_where(grads, freeze_fn):
    """Zero the gradient subtrees selected by ``freeze_fn(path) -> bool``.

    State-shape-stable alternative to the reference's requires_grad toggling
    (trainer_moco_flow.py:390-404): frozen leaves get exactly-zero updates
    (adam moments start and stay at zero for them)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)
    leaves, treedef = flat
    out = []
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out.append(jnp.zeros_like(leaf) if freeze_fn(key) else leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
