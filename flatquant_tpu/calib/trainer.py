"""Layer-wise FlatQuant calibration engine.

Parity target: flatquant/train_utils.py:14-171 —
  - capture layer-0 inputs once (the Catcher trick becomes a plain
    jitted embedding call — no exception control flow needed in JAX)
  - per layer: record FP teacher outputs, sq-style diag init from running
    activation absmax, then epochs x (nsamples/cali_bsz) AdamW steps on
    {transforms, diag, weight clips, act clips} with per-group LR
    (clips at 10x, train_utils.py:117-127), cosine annealing to
    flat_lr*1e-3, optional 16-step linear warmup, loss = MSE normalized by
    its own detached value (train_utils.py:147)
  - FP teacher outputs become the next layer's inputs (ping-pong buffers)

TPU-native deltas: the whole train step (layer forward + backward + AdamW)
is one jitted function; activations page host<->device per batch so the
device only ever holds one layer + one batch; fp32 master params with
bf16 compute (deactive_amp -> fp32).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from flatquant_tpu.core.transforms import (
    DecomposeTransform,
    InvFactor,
    SVDFactor,
    SingleTransform,
)
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import causal_mask, llama_layer, rope_tables
from flatquant_tpu.quantize.linear import LinearQuantState
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.state import (
    AttnFQ,
    CacheQuantState,
    LayerFQ,
    MlpFQ,
    set_layer,
    slice_layer,
)


# ---------------------------------------------------------------------------
# trainable-parameter labeling (param groups)
# ---------------------------------------------------------------------------


def _const_tree(t, label):
    return None if t is None else jax.tree.map(lambda _: label, t)


def _label_factor(f):
    return _const_tree(f, "trans")


def _label_decompose(t: Optional[DecomposeTransform]):
    if t is None:
        return None
    return t.replace(
        left=_label_factor(t.left),
        right=_label_factor(t.right),
        diag_scale=None if t.diag_scale is None else "diag",
    )


def _label_single(t: Optional[SingleTransform]):
    if t is None:
        return None
    return t.replace(factor=_label_factor(t.factor))


def _label_linear(l: LinearQuantState):
    return LinearQuantState(
        clip_w_max=None if l.clip_w_max is None else "clip_w",
        clip_w_min=None if l.clip_w_min is None else "clip_w",
        clip_a_max=None if l.clip_a_max is None else "clip_a",
        clip_a_min=None if l.clip_a_min is None else "clip_a",
    )


def _label_cache(c: CacheQuantState):
    return CacheQuantState(
        clip_a_max=None if c.clip_a_max is None else "clip_a",
        clip_a_min=None if c.clip_a_min is None else "clip_a",
    )


def build_labels(fq: LayerFQ) -> LayerFQ:
    """Label pytree matching LayerFQ: trans | diag | clip_w | clip_a."""
    a = fq.attn
    m = fq.mlp
    return LayerFQ(
        attn=AttnFQ(
            ln_trans=_label_decompose(a.ln_trans),
            o_trans=_label_single(a.o_trans),
            kcache_trans=_label_single(a.kcache_trans),
            vcache_trans=_label_single(a.vcache_trans),
            q_lin=_label_linear(a.q_lin),
            k_lin=_label_linear(a.k_lin),
            v_lin=_label_linear(a.v_lin),
            o_lin=_label_linear(a.o_lin),
            q_cache=_label_cache(a.q_cache),
            k_cache=_label_cache(a.k_cache),
            v_cache=_label_cache(a.v_cache),
        ),
        mlp=MlpFQ(
            up_gate_trans=_label_decompose(m.up_gate_trans),
            down_trans=_label_decompose(m.down_trans),
            up_lin=_label_linear(m.up_lin),
            gate_lin=_label_linear(m.gate_lin),
            down_lin=_label_linear(m.down_lin),
        ),
    )


def make_optimizer(fq_cfg: FQConfig, labels: LayerFQ, total_steps: int):
    """AdamW with per-group cosine LR (clips 10x), frozen groups zeroed."""
    eta_min = fq_cfg.flat_lr * 1e-3

    def sched(base_lr):
        cos = optax.cosine_decay_schedule(base_lr, total_steps, alpha=eta_min / base_lr)
        if not fq_cfg.warmup:
            return cos
        return lambda step: cos(step) * (
            0.01 + 0.99 * jnp.minimum(step.astype(jnp.float32), 16.0) / 16.0
        )

    def adamw(base_lr):
        # torch AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01
        return optax.adamw(sched(base_lr), b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    group_enabled = {
        "trans": fq_cfg.cali_trans,
        "diag": fq_cfg.add_diag,
        "clip_w": fq_cfg.lwc,
        "clip_a": fq_cfg.lac,
    }
    txs = {
        g: (adamw(fq_cfg.flat_lr * (10.0 if g.startswith("clip") else 1.0)) if on
            else optax.set_to_zero())
        for g, on in group_enabled.items()
    }
    return optax.multi_transform(txs, labels)


# ---------------------------------------------------------------------------
# diag init
# ---------------------------------------------------------------------------


def _get_init_scale(w_smax, x_smax, alpha):
    """(w^{1-a} / x^a).clamp(1e-5) — function_utils.py:7-8."""
    return jnp.clip(w_smax ** (1.0 - alpha) / jnp.maximum(x_smax, 1e-5) ** alpha, 1e-5)


def sq_init_diag(lp: dict, fq_l: LayerFQ, stats: dict, alpha: float) -> LayerFQ:
    """SmoothQuant-style diag init from weight/activation absmax
    (llama_utils.py init_diag_scale, :95-104,308-315)."""
    a, m = fq_l.attn, fq_l.mlp
    if a.ln_trans is not None and a.ln_trans.diag_scale is not None:
        qkv_w = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=0)
        w_smax = jnp.max(jnp.abs(qkv_w), axis=0)
        a = a.replace(
            ln_trans=a.ln_trans.replace(
                diag_scale=_get_init_scale(w_smax, stats["ln"], alpha)
            )
        )
    if m.up_gate_trans is not None and m.up_gate_trans.diag_scale is not None:
        ug_w = jnp.concatenate([lp["wup"], lp["wgate"]], axis=0)
        w_smax = jnp.max(jnp.abs(ug_w), axis=0)
        m = m.replace(
            up_gate_trans=m.up_gate_trans.replace(
                diag_scale=_get_init_scale(w_smax, stats["up"], alpha)
            )
        )
    if m.down_trans is not None and m.down_trans.diag_scale is not None:
        w_smax = jnp.max(jnp.abs(lp["wdown"]), axis=0)
        m = m.replace(
            down_trans=m.down_trans.replace(
                diag_scale=_get_init_scale(w_smax, stats["down"], alpha)
            )
        )
    return fq_l.replace(attn=a, mlp=m)


# ---------------------------------------------------------------------------
# calibration driver
# ---------------------------------------------------------------------------


def capture_embeddings(cfg, params, tokens: np.ndarray, compute_dtype, bsz: int = 8):
    """Layer-0 inputs for all calibration samples -> host array [N, S, H]."""
    embed = jax.jit(lambda t: params["embed"][t].astype(compute_dtype))
    outs = []
    for i in range(0, tokens.shape[0], bsz):
        outs.append(np.asarray(embed(jnp.asarray(tokens[i : i + bsz]))))
    return np.concatenate(outs, axis=0)


def calibrate_layers(
    fq_cfg: FQConfig,
    layers_params,
    fq_state,
    inps: np.ndarray,
    fp_fn,
    calib_fn,
    labels,
    num_layers: int,
    diag_init_fn=None,
    log: Callable[[str], None] = print,
    save_cb: Optional[Callable[[int, object], None]] = None,
    epochs: Optional[int] = None,
    layer_params_fn=None,
):
    """Model-agnostic layer-wise calibration core.

    fp_fn(lp, x) -> (teacher_out, stats); calib_fn(fq_l, lp, x) -> out;
    labels: param-group label pytree for one layer; diag_init_fn(lp, fq_l,
    stats) -> fq_l. layer_params_fn(i) overrides the default stacked-slice
    access (heterogeneous layer stacks, e.g. DeepSeek dense/moe).
    """
    nsamples = inps.shape[0]
    bsz = fq_cfg.cali_bsz
    n_epochs = fq_cfg.epochs if epochs is None else epochs
    steps_per_epoch = max(1, nsamples // bsz)
    total_steps = max(1, n_epochs * steps_per_epoch)
    tx = make_optimizer(fq_cfg, labels, total_steps)

    fp_step = jax.jit(fp_fn)

    @jax.jit
    def train_step(fq_l, opt_state, lp, x, teacher):
        def loss_fn(fq_l):
            out = calib_fn(fq_l, lp, x)
            mse = jnp.mean(
                (out.astype(jnp.float32) - teacher.astype(jnp.float32)) ** 2
            )
            return mse / jax.lax.stop_gradient(mse), mse

        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(fq_l)
        updates, opt_state = tx.update(grads, opt_state, fq_l)
        fq_l = optax.apply_updates(fq_l, updates)
        return fq_l, opt_state, mse

    for i in range(num_layers):
        if layer_params_fn is not None:
            lp = jax.device_put(layer_params_fn(i))
        else:
            lp = jax.device_put(slice_layer(layers_params, i))
        fq_l = slice_layer(fq_state, i)

        # FP teacher outputs + running act absmax stats
        outs = np.empty_like(inps)
        run_stats = None
        t0 = time.time()
        for j in range(0, nsamples, bsz):
            o, st = fp_step(lp, jnp.asarray(inps[j : j + bsz]))
            outs[j : j + bsz] = np.asarray(o)
            if run_stats is None:
                run_stats = {k: np.asarray(v) for k, v in st.items()}
            else:
                run_stats = {k: np.maximum(run_stats[k], np.asarray(st[k])) for k in st}

        if diag_init_fn is not None and fq_cfg.diag_init == "sq_style":
            stats = {k: jnp.asarray(v) for k, v in run_stats.items()}
            fq_l = diag_init_fn(lp, fq_l, stats)

        opt_state = tx.init(fq_l)
        for epoch in range(n_epochs):
            mse_sum = 0.0
            tick = time.time()
            for j in range(steps_per_epoch):
                lo = j * bsz
                x = jnp.asarray(inps[lo : lo + bsz])
                teacher = jnp.asarray(outs[lo : lo + bsz])
                fq_l, opt_state, mse = train_step(fq_l, opt_state, lp, x, teacher)
                mse_sum += float(mse)
            log(
                f"layer {i} epoch {epoch} mse {mse_sum:.8f} "
                f"time {time.time() - tick:.2f}s"
            )

        fq_state = set_layer(fq_state, i, jax.device_get(fq_l))
        inps, outs = outs, inps  # FP outputs feed the next layer
        log(f"layer {i} done in {time.time() - t0:.1f}s")
        if save_cb is not None:
            save_cb(i, fq_state)

    return fq_state


def calibrate(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    params: dict,
    fq_state,
    train_tokens: np.ndarray,
    compute_dtype=None,
    log: Callable[[str], None] = print,
    save_cb: Optional[Callable[[int, object], None]] = None,
    epochs: Optional[int] = None,
):
    """Llama-family layer-wise calibration (wrapper over calibrate_layers).

    train_tokens: [nsamples, seqlen] int32. save_cb(i, fq_state) is invoked
    after each layer (incremental resume artifact, train_utils.py:157-159).
    """
    if compute_dtype is None:
        compute_dtype = jnp.float32 if fq_cfg.deactive_amp else jnp.bfloat16
    nsamples, seqlen = train_tokens.shape
    cos, sin = rope_tables(cfg, jnp.arange(seqlen))
    mask = causal_mask(seqlen)
    inps = capture_embeddings(cfg, params, train_tokens, compute_dtype)

    def fp_fn(lp, x):
        return llama_layer(cfg, None, "fp", lp, None, x, cos, sin, mask, with_stats=True)

    def calib_fn(fq_l, lp, x):
        return llama_layer(cfg, fq_cfg, "calib", lp, fq_l, x, cos, sin, mask)

    labels = build_labels(slice_layer(fq_state, 0))

    return calibrate_layers(
        fq_cfg,
        params["layers"],
        fq_state,
        inps,
        fp_fn,
        calib_fn,
        labels,
        num_layers=cfg.num_layers,
        diag_init_fn=lambda lp, fq_l, stats: sq_init_diag(lp, fq_l, stats, fq_cfg.diag_alpha),
        log=log,
        save_cb=save_cb,
        epochs=epochs,
    )
