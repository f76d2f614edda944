#!/usr/bin/env python
"""Quantize + calibrate + evaluate a VLM — the CLI entry point.

Flag parity with the reference pipeline scripts (``exam/quant_qwenvl.py``
:265-588 and siblings); one script serves all five model families (the
per-model wrappers quant_qwenvl.py / quant_qwen2vl.py / quant_internvl.py /
quant_minicpmv.py / quant_glm4v.py preset ``--model``).

Example (the reference's headline W4A8 config, docs/qwen2vl.md):
  python exam/quant_vlm.py --model Qwen2-VL-7B --model_dir /ckpt/Qwen2-VL-7B \
      --rotate --online_llm_hadamard --llm_split \
      --llm_w_bits 4 --llm_a_bits 8 --visual_w_bits 8 --visual_a_bits 8 \
      --llm_static --visual_static --act_order --nsamples 128 \
      --calib_num 128 --dataset_name MME --artifact out/qwen2vl7b_w4a8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parser_gen(model_default=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=model_default, required=model_default is None,
                   help="family/preset: Qwen-VL-Chat | Qwen2-VL-{2B,7B,72B} | "
                        "InternVL2-8B | MiniCPM-V-2_6 | GLM-4V-9B")
    p.add_argument("--model_dir", default=None, help="HF checkpoint dir "
                   "(omitted → random weights, smoke/bench mode)")
    p.add_argument("--tiny", action="store_true", help="tiny config (CI smoke)")
    p.add_argument("--seed", type=int, default=0)
    # rotation (ref: --rotate --rotate_mode --rotate_visual_clip ...)
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--rotate_mode", default="hadamard", choices=["hadamard", "random"])
    p.add_argument("--no_rotate_visual", action="store_true")
    p.add_argument("--no_rotate_llm", action="store_true",
                   help="vision-only rotation (inverse of ref --rotate_llm)")
    p.add_argument("--online_llm_hadamard", action="store_true")
    p.add_argument("--online_had_mode", default="full",
                   choices=["full", "block", "auto"],
                   help="block: I ⊗ H_128 online transform (one MXU-perfect "
                        "matmul at serve time; TPU TTFT fast path); auto: "
                        "calib-time gate picks full vs block by int8 MSE on "
                        "captured down_proj inputs (neither dominates — see "
                        "tests/test_outlier_stress.py adversarial patterns)")
    p.add_argument("--llm_split", action="store_true")
    p.add_argument("--online_visual_hadamard", action="store_true")
    p.add_argument("--visual_split", action="store_true")
    p.add_argument("--smooth_alpha", type=float, default=0.0,
                   help="SmoothQuant-style migration before rotation "
                        "(0 = off; beyond the reference)")
    p.add_argument("--fp32_had", action="store_true",
                   help="accepted for flag parity; the online Hadamard always "
                        "accumulates in fp32 on TPU")
    # weights
    p.add_argument("--visual_w_bits", type=int, default=8)
    p.add_argument("--llm_w_bits", type=int, default=4)
    p.add_argument("--visual_w_rtn", action="store_true", default=True)
    p.add_argument("--visual_w_gptq", action="store_true",
                   help="GPTQ for the vision tower blocks (default: RTN)")
    p.add_argument("--llm_w_rtn", action="store_true")
    p.add_argument("--visual_w_clip", "--llm_w_clip", dest="w_clip",
                   action="store_true")
    p.add_argument("--w_groupsize", type=int, default=None)
    p.add_argument("--auto_bits", type=float, default=0.0,
                   help="sensitivity-based mixed precision: target average "
                        "weight bits (e.g. 4.5). SUPERSEDES --visual_w_bits/"
                        "--llm_w_bits for every measured weight site: all "
                        "start at --auto_bits_low (4) and the most-damaging "
                        "are promoted to --auto_bits_high (8) under the "
                        "budget (beyond the reference)")
    p.add_argument("--lm_head_bits", default="0",
                   help="lm_head weight width: 0 = fp head (reference "
                        "parity), 8/4 = int8 / packed-W4 head (halves or "
                        "quarters the decode head stream), auto = per-model "
                        "quality-proxy gate picks W4 iff its head-only "
                        "perplexity ratio stays under --lm_head_gate")
    p.add_argument("--lm_head_gate", type=float, default=1.002)
    p.add_argument("--act_order", action="store_true")
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--nsamples", type=int, default=128)
    # activations
    p.add_argument("--visual_a_bits", type=int, default=8)
    p.add_argument("--llm_a_bits", type=int, default=8)
    p.add_argument("--visual_static", action="store_true", default=True)
    p.add_argument("--llm_static", action="store_true", default=True)
    p.add_argument("--a_asym", action="store_true")
    p.add_argument("--w_asym", action="store_true")
    p.add_argument("--a_groupsize", type=int, default=None)
    p.add_argument("--a_clip_ratio", type=float, default=1.0)
    p.add_argument("--act_per_tensor", action="store_true", default=True)
    p.add_argument("--act_observer", default="minmax",
                   choices=["minmax", "ema", "percentile", "omse", "ptf"])
    p.add_argument("--calib_num", type=int, default=128)
    p.add_argument("--calib_decode_steps", type=int, default=0,
                   help="also calibrate on N greedy decode steps per batch "
                        "(the reference calibrates through generate())")
    p.add_argument("--calib_dataset", default=None,
                   help="calibrate on real prompts from this eval dataset "
                        "(same names as --dataset_name); default: synthetic")
    p.add_argument("--skip_names", nargs="*", default=[])
    # serving / output
    p.add_argument("--realize_int", action="store_true",
                   help="store real INT4/INT8 weights for the serving kernels")
    p.add_argument("--k_bits", "--v_bits", dest="kv_bits", type=int, default=None,
                   help="quantize the KV cache (8 → int8 per-token-head "
                        "symmetric; 4 → nibble-packed uint4 asymmetric)")
    p.add_argument("--artifact", default=None, help="artifact output dir")
    p.add_argument("--export_safetensors", default=None,
                   help="also write params/state as .safetensors files "
                        "(interop with non-JAX toolchains)")
    p.add_argument("--dataset_name", default=None,
                   help="eval dataset (MME | MMBench | OCRBench | TextVQA_VAL "
                        "| DocVQA_VAL | SyntheticVQA | path to TSV)")
    p.add_argument("--eval_limit", type=int, default=None)
    p.add_argument("--judge_artifact", default=None,
                   help="artifact dir of a JUDGE model: MCQ predictions "
                        "exact matching cannot parse are matched by this "
                        "served model (the reference's ChatGPT-judge slot, "
                        "egress-free)")
    p.add_argument("--eval_batch", type=int, default=0,
                   help=">1: evaluate through the continuous-batching "
                        "engine pool, eval_batch rows at a time")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--log_file", default=None)
    return p


def main(args=None):
    args = args or parser_gen().parse_args()
    from mquant_tpu.pipeline import QuantizeConfig, run_pipeline
    from mquant_tpu.utils.misc import (config_logging,
                                       enable_compilation_cache,
                                       seed_everything)

    log = config_logging(args.log_file)
    seed_everything(args.seed)
    enable_compilation_cache()  # repeat runs skip recompiles (off: MQUANT_COMPILE_CACHE=off)

    q = QuantizeConfig(
        rotate=args.rotate, rotate_mode=args.rotate_mode,
        rotate_visual=not args.no_rotate_visual,
        rotate_llm=not args.no_rotate_llm,
        online_llm_hadamard=args.online_llm_hadamard, llm_split=args.llm_split,
        online_had_mode=args.online_had_mode,
        online_visual_hadamard=args.online_visual_hadamard,
        smooth_alpha=args.smooth_alpha,
        visual_split=args.visual_split,
        visual_w_bits=args.visual_w_bits, llm_w_bits=args.llm_w_bits,
        visual_w_rtn=args.visual_w_rtn and not args.visual_w_gptq,
        llm_w_rtn=args.llm_w_rtn,
        w_clip=args.w_clip, w_groupsize=args.w_groupsize,
        auto_bits=args.auto_bits,
        lm_head_bits=(args.lm_head_bits if args.lm_head_bits == "auto"
                      else int(args.lm_head_bits)),
        lm_head_gate=args.lm_head_gate,
        act_order=args.act_order, percdamp=args.percdamp,
        nsamples=args.nsamples, visual_a_bits=args.visual_a_bits,
        llm_a_bits=args.llm_a_bits, visual_static=args.visual_static,
        llm_static=args.llm_static, a_asym=args.a_asym, w_asym=args.w_asym,
        a_groupsize=args.a_groupsize, a_clip_ratio=args.a_clip_ratio,
        act_per_tensor=args.act_per_tensor, act_observer=args.act_observer,
        calib_num=args.calib_num, skip_names=tuple(args.skip_names),
        calib_decode_steps=args.calib_decode_steps,
        realize_int=args.realize_int, kv_bits=args.kv_bits, seed=args.seed)

    tokenizer = None
    if args.model_dir:
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                args.model_dir, trust_remote_code=True)
        except Exception as e:
            log.warning(f"tokenizer load failed ({e}); using byte tokenizer")

    cfg, params, state, specs, info = run_pipeline(
        args.model, q, model_dir=args.model_dir, artifact_dir=args.artifact,
        calib_dataset=args.calib_dataset, tokenizer=tokenizer,
        tiny=args.tiny)
    log.info(f"pipeline done: {args.model} ({info})")

    if args.export_safetensors:
        import json

        from mquant_tpu.utils.checkpoint import (config_to_dict,
                                                 export_safetensors)

        os.makedirs(args.export_safetensors, exist_ok=True)
        meta = {"model": args.model,
                "config": json.dumps(config_to_dict(cfg))}
        export_safetensors(params, os.path.join(
            args.export_safetensors, "params.safetensors"), extra_meta=meta)
        if state is not None:
            export_safetensors(state, os.path.join(
                args.export_safetensors, "state.safetensors"))
        log.info(f"safetensors written to {args.export_safetensors}")

    if args.dataset_name:
        from mquant_tpu.evaluation.adapter import VLMRunner
        from mquant_tpu.evaluation.eval import build_dataset, eval_dataset

        runner = VLMRunner(args.model, cfg, params, specs=specs, state=state,
                           mode="real" if args.realize_int else "fake",
                           tokenizer=tokenizer,
                           kv_quant=args.kv_bits or False)
        ds = build_dataset(args.dataset_name)
        batch_fn = (runner.engine_server(slots=args.eval_batch)
                    if args.eval_batch and args.eval_batch > 1 else None)
        extract_fn = None
        if args.judge_artifact:
            # a second served model matches unparseable MCQ answers (the
            # reference's ChatGPT-judge slot, image_mcq.py:216-224 — here
            # any model artifact, e.g. the un-quantized or int8 variant)
            from mquant_tpu.evaluation.judge import runner_judge
            from mquant_tpu.serve.server import build_runner_from_artifact

            judge_runner = build_runner_from_artifact(args.judge_artifact)
            extract_fn = runner_judge(judge_runner)
        eval_dataset(runner.generate, ds, out_dir=args.output_dir,
                     model_name=args.model, limit=args.eval_limit,
                     batch_fn=batch_fn, batch_size=args.eval_batch,
                     extract_fn=extract_fn)


if __name__ == "__main__":
    main()
