"""flatquant-tpu CLI: calibrate -> quantize -> eval -> (export | serve demo).

The main.py / args_utils.py analog of the reference (main.py:12-91,
args_utils.py:28-161), driving the same pipeline on TPU:

  get model -> calibration data -> apply FlatQuant -> layer-wise calibrate
  -> save flat_parameters -> bake (reparameterize) -> save flat_matrices
  -> GPTQ|RTN weight quant -> PPL eval -> [packed int4 export, generation]

Works fully offline: --model tiny-llama with synthetic data exercises the
whole pipeline on CPU; --hf_path loads a local HF checkpoint directory.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def parser_gen():
    p = argparse.ArgumentParser("flatquant-tpu")
    p.add_argument("--model", default="tiny-llama", help="config name (models.config registry)")
    p.add_argument("--hf_path", default=None, help="local HF checkpoint dir (safetensors)")
    p.add_argument("--hf_token", default=None, help="accepted for reference-CLI compatibility; unused (zero-egress environment)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"], help="force jax platform")
    # bits
    p.add_argument("--w_bits", type=int, default=16)
    p.add_argument("--a_bits", type=int, default=16)
    p.add_argument("--q_bits", type=int, default=16)
    p.add_argument("--k_bits", type=int, default=16)
    p.add_argument("--v_bits", type=int, default=16)
    p.add_argument("--w_asym", action="store_true")
    p.add_argument("--a_asym", action="store_true")
    p.add_argument("--q_asym", action="store_true")
    p.add_argument("--k_asym", action="store_true")
    p.add_argument("--v_asym", action="store_true")
    p.add_argument("--a_groupsize", type=int, default=-1)
    p.add_argument("--w_groupsize", type=int, default=-1)
    p.add_argument("--q_groupsize", type=int, default=-1)
    p.add_argument("--k_groupsize", type=int, default=-1)
    p.add_argument("--v_groupsize", type=int, default=-1)
    # learnables
    p.add_argument("--cali_trans", action="store_true", help="train transforms")
    p.add_argument("--add_diag", action="store_true")
    p.add_argument("--lwc", action="store_true")
    p.add_argument("--lac", action="store_true")
    p.add_argument("--direct_inv", action="store_true")
    p.add_argument("--separate_vtrans", action="store_true")
    p.add_argument("--diag_init", default="sq_style", choices=["sq_style", "one_style"])
    p.add_argument("--diag_alpha", type=float, default=0.3)
    # calibration
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--cali_bsz", type=int, default=4)
    p.add_argument("--flat_lr", type=float, default=5e-3)
    p.add_argument("--warmup", action="store_true")
    p.add_argument("--deactive_amp", action="store_true")
    p.add_argument("--cali_dataset", default="synthetic",
                   help="wikitext2|c4|ptb|pile|synthetic, or a LOCAL "
                        "corpus file path (.txt/.jsonl/.json; needs "
                        "--tokenizer_path) — the zero-egress route")
    p.add_argument("--seqlen", type=int, default=None)
    # weight quant pass
    p.add_argument("--v3_not_last", type=int, default=0, metavar="N",
                   help="DeepSeek: leave the last N MoE layers unquantized "
                        "(main_dpskv3.py:456-459 analog)")
    p.add_argument("--tpu_decompose", action="store_true",
                   help="TPU-native (n/128, 128) Kronecker decomposition "
                        "for every transform dim divisible by 128 — "
                        "unlocks the grouped serving pipeline end-to-end")
    p.add_argument("--gptq", action="store_true", help="GPTQ instead of RTN")
    p.add_argument("--act_order", action="store_true")
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--gptq_mse", action="store_true",
                   help="MSE grid search for weight clip (quant_utils.py:177-202)")
    # artifacts / resume
    p.add_argument("--output_dir", default="./outputs")
    p.add_argument("--exp_name", default="exp")
    p.add_argument("--resume", action="store_true", help="reload flat_parameters")
    p.add_argument("--reload_matrix", action="store_true", help="reload flat_matrices")
    p.add_argument("--matrix_path", default=None)
    p.add_argument("--save_matrix", action="store_true")
    p.add_argument("--quantized_save", action="store_true", help="export packed int4 safetensors")
    p.add_argument("--perm_transforms", action="store_true",
                   help="serving layout: one-copy transposed-output online "
                        "transforms with weight input channels permuted to "
                        "match (identical results, less prefill glue)")
    # eval
    p.add_argument("--eval_ppl", action="store_true")
    p.add_argument("--eval_datasets", nargs="+", default=["wikitext2"])
    p.add_argument("--lm_eval", nargs="*", default=None, help="lm-eval task names")
    p.add_argument("--lm_eval_batch_size", type=int, default=8)
    p.add_argument("--generate_demo", type=int, default=0, help="decode N tokens as a smoke test")
    p.add_argument("--plot_flatness", default=None, metavar="PNG",
                   help="save per-channel flatness curves (plot_flatness.py analog)")
    p.add_argument("--flatness_layers", type=int, nargs="+", default=[0])
    p.add_argument("--tokenizer_path", default=None)
    return p


def main(argv=None):
    args = parser_gen().parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flatquant_tpu.calib.data import get_loaders
    from flatquant_tpu.calib.gptq import gptq_model
    from flatquant_tpu.calib.trainer import calibrate
    from flatquant_tpu.evals.ppl import ppl_eval
    from flatquant_tpu.models.config import get_config
    from flatquant_tpu.models.llama import init_params
    from flatquant_tpu.models.loader import config_from_hf_json, load_hf_llama
    from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
    from flatquant_tpu.quantize.spec import FQConfig
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.utils import checkpoint as ckpt
    from flatquant_tpu.utils.logging_utils import create_logger

    fq_cfg = FQConfig(
        w_bits=args.w_bits, a_bits=args.a_bits, q_bits=args.q_bits,
        k_bits=args.k_bits, v_bits=args.v_bits,
        w_asym=args.w_asym, a_asym=args.a_asym, q_asym=args.q_asym,
        k_asym=args.k_asym, v_asym=args.v_asym,
        w_groupsize=args.w_groupsize, a_groupsize=args.a_groupsize,
        q_groupsize=args.q_groupsize,
        k_groupsize=args.k_groupsize, v_groupsize=args.v_groupsize,
        cali_trans=args.cali_trans, add_diag=args.add_diag,
        lwc=args.lwc, lac=args.lac, direct_inv=args.direct_inv,
        separate_vtrans=args.separate_vtrans,
        diag_init=args.diag_init, diag_alpha=args.diag_alpha,
        epochs=args.epochs, nsamples=args.nsamples, cali_bsz=args.cali_bsz,
        flat_lr=args.flat_lr, warmup=args.warmup, deactive_amp=args.deactive_amp,
        tpu_decompose=args.tpu_decompose,
        gptq=args.gptq, gptq_percdamp=args.percdamp, gptq_act_order=args.act_order,
        gptq_mse=args.gptq_mse,
    )

    exp_dir = os.path.join(
        args.output_dir, args.model, f"w{args.w_bits}a{args.a_bits}", args.exp_name
    )
    log = create_logger(exp_dir)
    log.info(f"args: {vars(args)}")
    log.info(f"devices: {jax.devices()}")

    # --- model ---
    is_deepseek = "deepseek" in args.model
    if is_deepseek:
        from flatquant_tpu.models.deepseek import (
            DEEPSEEK_V3,
            TINY_DEEPSEEK,
            init_ds_params,
        )

        if args.hf_path:
            from flatquant_tpu.models.ds_loader import (
                ds_config_from_hf_json,
                load_hf_deepseek,
            )

            cfg = ds_config_from_hf_json(args.hf_path, name=args.model)
            params = load_hf_deepseek(args.hf_path, cfg)
            log.info(f"loaded HF DeepSeek checkpoint from {args.hf_path}")
        else:
            cfg = {"deepseek-v3": DEEPSEEK_V3, "tiny-deepseek": TINY_DEEPSEEK}[args.model]
            params = init_ds_params(cfg, seed=args.seed)
            log.info(f"random-init DeepSeek model {args.model}")
    elif args.hf_path:
        cfg = config_from_hf_json(args.hf_path, name=args.model)
        params = load_hf_llama(args.hf_path, cfg)
        log.info(f"loaded HF checkpoint from {args.hf_path}")
    else:
        cfg = get_config(args.model)
        params = init_params(cfg, seed=args.seed)
        log.info(f"random-init model {args.model} (no --hf_path)")
    seqlen = args.seqlen or cfg.seqlen

    # --- data ---
    tokenizer = None
    if args.tokenizer_path:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_path)
    data = get_loaders(
        args.cali_dataset, cfg.vocab_size, nsamples=args.nsamples,
        seqlen=seqlen, seed=args.seed, tokenizer=tokenizer,
    )
    log.info(f"calibration data source: {data.source}, train {data.train.shape}")

    quantize = fq_cfg.quantize
    eval_params, eval_fq = params, None
    if quantize and is_deepseek:
        from flatquant_tpu.models.deepseek import (
            bake_ds_fq,
            calibrate_deepseek,
            deepseek_forward,
            init_ds_fq,
        )

        dense_fq, moe_fq = init_ds_fq(cfg, fq_cfg, seed=args.seed)
        if fq_cfg.cali_trans or fq_cfg.lwc or fq_cfg.lac or fq_cfg.add_diag:
            dense_fq, moe_fq = calibrate_deepseek(
                cfg, fq_cfg, params, dense_fq, moe_fq, data.train, log=log.info,
                save_cb=lambda i, st: ckpt.save_flat_parameters(exp_dir, st),
                skip_last=args.v3_not_last,
            )
        eval_fq = bake_ds_fq(dense_fq, moe_fq)
        if args.save_matrix:
            ckpt.save_flat_matrices(exp_dir, eval_fq)
            log.info("saved flat_matrices")
        if args.quantized_save:
            from flatquant_tpu.models.deepseek import build_ds_serving_params

            sp, _ = build_ds_serving_params(cfg, fq_cfg, params, dense_fq, moe_fq)
            path = ckpt.save_packed_safetensors(exp_dir, sp, {
                "model": args.model, "w_bits": fq_cfg.w_bits,
                "a_bits": fq_cfg.a_bits, "v3_not_last": args.v3_not_last,
            }, filename="ds_packed_int4.safetensors")
            log.info(f"saved packed DeepSeek serving params -> {path}")
        if args.eval_ppl:
            import numpy as _np

            d = get_loaders("synthetic", cfg.vocab_size, nsamples=2, seqlen=seqlen)
            n = d.test.shape[1] // seqlen
            total = 0.0
            fwd = jax.jit(lambda p, f, t: deepseek_forward(
                cfg, p, t, fq=f, fq_cfg=fq_cfg, mode="calib",
                n_fp_tail=args.v3_not_last))
            for i in range(n):
                chunk = jnp.asarray(d.test[:, i * seqlen:(i + 1) * seqlen])
                logits = fwd(params, eval_fq, chunk)
                lp_ = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
                nll = -jnp.take_along_axis(lp_, chunk[:, 1:, None], -1).mean()
                total += float(nll) * seqlen
            log.info(f"deepseek synthetic PPL: {float(_np.exp(total / (n * seqlen))):.4f}")
        log.info("done")
        return
    if quantize:
        fq_state = init_model_fq(cfg, fq_cfg, seed=args.seed)
        if args.reload_matrix:
            # reference-zoo .pth (flat_utils.py:65-93 schema) or our own
            # msgpack matrices artifact; either way: load eval matrices,
            # then bake fresh fp weights against them (main.py:30-38 analog)
            from flatquant_tpu.utils.reference_convert import (
                fq_from_flat_matrices,
                load_reference_flat_matrices,
                matrices_fq_template,
            )

            src = args.matrix_path or exp_dir
            pth = src if src.endswith(".pth") else os.path.join(src, "flat_matrices.pth")
            if os.path.exists(pth):
                fq_state = fq_from_flat_matrices(load_reference_flat_matrices(pth), cfg)
                log.info(f"reloaded reference flat_matrices from {pth}")
            else:
                template = matrices_fq_template(cfg, fq_cfg, seed=args.seed)
                fq_state = ckpt.load_flat_matrices(src, template)
                log.info(f"reloaded flat_matrices from {src}")
        elif args.resume and os.path.exists(os.path.join(exp_dir, "flat_parameters.msgpack")):
            fq_state = ckpt.load_flat_parameters(exp_dir, fq_state)
            log.info("resumed flat_parameters")
        elif fq_cfg.cali_trans or fq_cfg.lwc or fq_cfg.lac or fq_cfg.add_diag:
            fq_state = calibrate(
                cfg, fq_cfg, params, fq_state, data.train,
                log=log.info,
                save_cb=lambda i, st: ckpt.save_flat_parameters(exp_dir, st),
            )
        baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq_state)
        if args.save_matrix:
            # pre-fold form (diag scales intact): reloadable onto raw
            # weights, like the reference's save-before-reparameterize order
            from flatquant_tpu.utils.reference_convert import matrices_state

            ckpt.save_flat_matrices(exp_dir, matrices_state(fq_state))
            log.info("saved flat_matrices")
        if args.gptq:
            eval_params = gptq_model(
                cfg, fq_cfg, baked_params, baked_fq, data.train, log=log.info
            )
        else:
            eval_params = rtn_quantize_params(fq_cfg, baked_params)
        eval_fq = baked_fq

        if args.quantized_save:
            from flatquant_tpu.serving.quantized import build_serving_params

            sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq,
                                      eval_params=eval_params,
                                      perm_transforms=args.perm_transforms)
            path = ckpt.save_packed_safetensors(
                exp_dir, sp,
                quantization_config={
                    "w_bits": fq_cfg.w_bits, "a_bits": fq_cfg.a_bits,
                    "k_bits": fq_cfg.k_bits, "v_bits": fq_cfg.v_bits,
                    "model": args.model, "format": "packed_int4_planar",
                    "layout": "perm" if args.perm_transforms else "standard",
                },
            )
            log.info(f"exported packed int4 weights to {path}")

    # --- evals ---
    if args.eval_ppl:
        for ds in args.eval_datasets:
            d = get_loaders(ds, cfg.vocab_size, nsamples=2, seqlen=seqlen,
                            tokenizer=tokenizer)
            mode = "eval" if quantize else "fp"
            ppl = ppl_eval(cfg, eval_params, d.test, fq=eval_fq, fq_cfg=fq_cfg,
                           mode=mode, seqlen=seqlen)
            log.info(f"{ds} ({d.source}) PPL: {ppl:.4f}")

    if args.lm_eval is not None:
        from flatquant_tpu.evals.tasks import run_lm_eval

        results = run_lm_eval(
            cfg, eval_params, eval_fq, fq_cfg,
            tasks=args.lm_eval, tokenizer=tokenizer,
            batch_size=args.lm_eval_batch_size, log=log.info,
        )
        log.info(f"lm-eval: {results}")

    if args.plot_flatness and not is_deepseek:
        from flatquant_tpu.evals.flatness import model_flatness, plot_flatness

        toks = jnp.asarray(data.train[:1, : min(seqlen, 128)])
        fqs = fq_state if quantize else None
        res = model_flatness(cfg, params, fqs, toks, layers=tuple(args.flatness_layers))
        path = plot_flatness(res, args.plot_flatness)
        log.info(f"flatness plot saved to {path}")

    if args.generate_demo > 0 and quantize:
        from flatquant_tpu.serving.engine import generate
        from flatquant_tpu.serving.quantized import build_serving_params

        sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq,
                                  eval_params=eval_params,
                                  perm_transforms=args.perm_transforms)
        prompt = data.test[:, :16].astype(np.int32)
        toks = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=args.generate_demo,
                        max_len=64, use_kernel=jax.default_backend() == "tpu")
        log.info(f"generated tokens: {toks.tolist()}")

    log.info("done")


if __name__ == "__main__":
    main()
