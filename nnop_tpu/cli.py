"""Command-line entry points: train / generate / bench on the tiny or 8B
configs.  Usage:

    python -m nnop_tpu.cli train --steps 50 --seq 128
    python -m nnop_tpu.cli generate --prompt "abcabc" --max-new 32
    python -m nnop_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys
import time


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from nnop_tpu.models.llama import LlamaConfig, init_params, loss_fn
    from nnop_tpu.models.weights import save_checkpoint
    from nnop_tpu.parallel.tp_llama import AdamW
    from nnop_tpu.runtime.dataio import batches, pack_tokens

    cfg = {
        "8b": LlamaConfig.llama3_8b,
        "tiny": lambda: LlamaConfig.tiny(dtype=jnp.float32),
        "tiny_moe": lambda: LlamaConfig.tiny_moe(dtype=jnp.float32),
        "mixtral": LlamaConfig.mixtral_8x7b,
    }[args.model]()
    params = init_params(jax.random.key(args.seed), cfg)
    opt = AdamW(lr=args.lr)
    state = opt.init(params)

    # synthetic corpus when no data file is given
    if args.data:
        import numpy as np

        stream = list(np.fromfile(args.data, dtype=np.int32) % cfg.vocab_size)
    else:
        stream = [(7 * i + 3) % cfg.vocab_size for i in range(args.seq * 64)]
    rows = pack_tokens([stream], seq_len=args.seq)

    if args.mesh:
        # dp[,tp[,sp]] sharded training (parallel/tp_llama.py)
        from nnop_tpu.parallel.mesh import make_mesh
        from nnop_tpu.parallel.tp_llama import make_train_step, shard_params

        dims = dict(zip(("data", "model", "seq"),
                        [int(x) for x in args.mesh.split(",")]))
        mesh = make_mesh(**dims)
        if args.fsdp:
            from nnop_tpu.parallel.tp_llama import fsdp_param_specs

            specs = fsdp_param_specs(cfg, dims.get("data", 1))
            params = shard_params(params, mesh, cfg, specs=specs)
        else:
            params = shard_params(params, mesh, cfg)
        step, opt = make_train_step(mesh, cfg, optimizer=opt,
                                    remat=args.remat, fsdp=args.fsdp)
        state = opt.init(params)
    else:
        @jax.jit
        def step(params, state, toks, tgts):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, toks, tgts, cfg
            )
            params, state = opt.update(grads, state, params)
            return params, state, loss

    n = 0
    t0 = time.time()
    while n < args.steps:
        for toks, tgts in batches(rows, args.batch, seed=n):
            params, state, loss = step(
                params, state, jnp.asarray(toks), jnp.asarray(tgts)
            )
            n += 1
            if n % 10 == 0 or n == args.steps:
                print(f"step {n}: loss {float(loss):.4f} "
                      f"({(time.time()-t0)/n:.2f} s/step)")
            if n >= args.steps:
                break
    if args.checkpoint:
        save_checkpoint(args.checkpoint, params)
        print(f"saved {args.checkpoint}")


def cmd_generate(args):
    import jax
    import jax.numpy as jnp

    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.models.weights import load_checkpoint, load_hf_llama
    from nnop_tpu.runtime.engine import Engine
    from nnop_tpu.runtime.tokenizer import BPETokenizer

    cfg = {
        "8b": LlamaConfig.llama3_8b,
        "tiny": lambda: LlamaConfig.tiny(dtype=jnp.float32),
        "tiny_moe": lambda: LlamaConfig.tiny_moe(dtype=jnp.float32),
        "mixtral": LlamaConfig.mixtral_8x7b,
    }[args.model]()
    params = init_params(jax.random.key(args.seed), cfg)
    if args.hf_path:
        params = load_hf_llama(args.hf_path, cfg)
    elif args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    if args.wbits < 16:
        from nnop_tpu.models.quantized import quantize_params

        params = quantize_params(params, wbits=args.wbits)

    # byte-level tokenizer with no merges = raw bytes (demo default)
    tok = BPETokenizer([])
    eng = Engine(
        params, cfg, max_batch=args.batch, max_seq=cfg.max_seq_len,
        quantized_kv=args.int8_kv, tokenizer=tok,
    )
    reqs = [eng.submit_text(p, args.max_new) for p in args.prompt]
    t0 = time.time()
    eng.run()
    dt = time.time() - t0
    total = sum(len(r.out) for r in reqs)
    for r in reqs:
        print(f"[{r.rid}] {r.out}")
    print(f"{total} tokens in {dt:.2f}s = {total/dt:.1f} tok/s")


def cmd_serve(args):
    import jax
    import jax.numpy as jnp

    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.models.weights import load_checkpoint, load_hf_llama
    from nnop_tpu.runtime.engine import Engine
    from nnop_tpu.runtime.server import EngineServer
    from nnop_tpu.runtime.tokenizer import BPETokenizer, VocabBPETokenizer

    cfg = {
        "8b": LlamaConfig.llama3_8b,
        "tiny": lambda: LlamaConfig.tiny(dtype=jnp.float32),
        "tiny_moe": lambda: LlamaConfig.tiny_moe(dtype=jnp.float32),
        "mixtral": LlamaConfig.mixtral_8x7b,
    }[args.model]()
    params = init_params(jax.random.key(args.seed), cfg)
    if args.hf_path:
        params = load_hf_llama(args.hf_path, cfg)
    elif args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    if args.wbits < 16:
        from nnop_tpu.models.quantized import quantize_params

        params = quantize_params(params, wbits=args.wbits)
    tok = (VocabBPETokenizer.from_file(args.tokenizer)
           if args.tokenizer else BPETokenizer([]))
    eng = Engine(
        params, cfg, max_batch=args.batch, max_seq=cfg.max_seq_len,
        quantized_kv=args.int8_kv, tokenizer=tok,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
    )
    srv = EngineServer(eng, host=args.host, port=args.port).start()
    print(f"serving {args.model} on http://{args.host}:{srv.port} "
          f"(POST /v1/completions, GET /v1/stats)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


def cmd_bench(args):
    import subprocess

    sys.exit(subprocess.call([sys.executable, "bench.py"]))


def main():
    ap = argparse.ArgumentParser(prog="nnop_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--model", default="tiny",
                   choices=["tiny", "tiny_moe", "8b", "mixtral"])
    t.add_argument("--mesh", default="",
                   help="dp[,tp[,sp]] device mesh, e.g. 2,2,2")
    t.add_argument("--steps", type=int, default=50)
    t.add_argument("--batch", type=int, default=4)
    t.add_argument("--seq", type=int, default=128)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--data", default=None, help="int32 token file")
    t.add_argument("--remat", action="store_true",
                   help="per-layer activation checkpointing (mesh mode)")
    t.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params+optimizer over the data "
                        "axis, gather-on-use (mesh mode)")
    t.add_argument("--checkpoint", default=None)
    t.set_defaults(fn=cmd_train)

    g = sub.add_parser("generate")
    g.add_argument("--model", default="tiny",
                   choices=["tiny", "tiny_moe", "8b", "mixtral"])
    g.add_argument("--prompt", nargs="+", default=["hello world"])
    g.add_argument("--max-new", type=int, default=32)
    g.add_argument("--batch", type=int, default=4)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--int8-kv", action="store_true")
    g.add_argument("--wbits", type=int, default=16, choices=(4, 8, 16),
                   help="weight-only quantization (16 = keep fp)")
    g.add_argument("--hf-path", default=None)
    g.add_argument("--checkpoint", default=None)
    g.set_defaults(fn=cmd_generate)

    sv = sub.add_parser("serve")
    sv.add_argument("--model", default="tiny",
                    choices=["tiny", "tiny_moe", "8b", "mixtral"])
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--batch", type=int, default=8)
    sv.add_argument("--seed", type=int, default=0)
    sv.add_argument("--int8-kv", action="store_true")
    sv.add_argument("--wbits", type=int, default=16, choices=(4, 8, 16))
    sv.add_argument("--temperature", type=float, default=0.0)
    sv.add_argument("--top-k", type=int, default=0)
    sv.add_argument("--top-p", type=float, default=1.0)
    sv.add_argument("--tokenizer", default=None,
                    help="HF tokenizer.json path (default: raw bytes)")
    sv.add_argument("--hf-path", default=None)
    sv.add_argument("--checkpoint", default=None)
    sv.set_defaults(fn=cmd_serve)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
