#!/usr/bin/env python
"""
Convert reference (torch) checkpoints to the native .npz format.

Usage:
    python scripts/convert_checkpoints.py input.pth output.npz
    python scripts/convert_checkpoints.py --dust3r dust3r.pth out_dir/

Handles the reference checkpoint contract {"model": state_dict, **metadata}
(reference: uniception/models/encoders/croco.py:99-111) and the vanilla
DUSt3R -> UniCeption key remapping (reference:
examples/models/dust3r/convert_dust3r_weights_to_uniception.py:21-67:
dec_blocks -> multi_view_branches.0, dec_blocks2 -> multi_view_branches.1,
decoder_embed -> proj_embed, downstream_head{1,2} -> head{1,2}).

Requires torch (CPU) to read .pth files; the outputs load with numpy alone.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uniception_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402


def remap_vanilla_dust3r(state):
    """Vanilla DUSt3R/MASt3R state dict -> UniCeption-TPU DUSt3R keys.

    Shared-decoder checkpoints (no dec_blocks2) get the decoder duplicated
    into the second view branch, mirroring the reference converter
    (examples/models/dust3r/convert_dust3r_weights_to_uniception.py:29-34).
    """
    if not any(k.startswith("dec_blocks2") for k in state):
        dup = {k.replace("dec_blocks", "dec_blocks2", 1): v for k, v in state.items() if k.startswith("dec_blocks.")}
        state = {**state, **dup}
    out = {}
    for k, v in state.items():
        nk = k
        if nk.startswith("patch_embed.") or nk.startswith("enc_blocks.") or nk == "enc_norm.weight" or nk == "enc_norm.bias":
            nk = "encoder." + nk
        elif nk.startswith("dec_blocks2."):
            nk = nk.replace("dec_blocks2.", "info_sharing.multi_view_branches.1.")
        elif nk.startswith("dec_blocks."):
            nk = nk.replace("dec_blocks.", "info_sharing.multi_view_branches.0.")
        elif nk.startswith("decoder_embed."):
            nk = nk.replace("decoder_embed.", "info_sharing.proj_embed.")
        elif nk.startswith("dec_norm."):
            nk = nk.replace("dec_norm.", "info_sharing.norm.")
        elif nk.startswith(("downstream_head1.proj.", "downstream_head2.proj.")):
            head = nk[len("downstream_head")]
            nk = f"head{head}." + nk.split(".proj.", 1)[1]
            nk = nk.replace(f"head{head}.", f"head{head}.linear.", 1)
            # Vanilla uses nn.Linear (out, in); our LinearFeature is a 1x1
            # conv, so reshape to (out, in, 1, 1) — the reference converter
            # does the same via linear_to_conv2d
            # (examples/models/dust3r/convert_dust3r_weights_to_uniception.py:216).
            if nk.endswith(".weight") and getattr(v, "ndim", 0) == 2:
                v = v.reshape(v.shape[0], v.shape[1], 1, 1)
        elif nk.startswith(("downstream_head1.dpt.", "downstream_head2.dpt.")):
            head = nk[len("downstream_head")]
            sub = nk.split(".dpt.", 1)[1]
            # dpt.head.{0,2,4} is the regression processor
            # (reference converter key_replace_dict, same file :95-103);
            # everything else is the DPT feature pyramid.
            reg_map = {"0": "conv1", "2": "conv2.0", "4": "conv2.2"}
            if sub.startswith("head."):
                idx, rest = sub[len("head.") :].split(".", 1)
                nk = f"dpt_regressor_head{head}.{reg_map[idx]}.{rest}"
            else:
                nk = f"dpt_feature_head{head}.{sub}"
        elif nk.startswith("downstream_head1."):
            nk = nk.replace("downstream_head1.", "head1.")
        elif nk.startswith("downstream_head2."):
            nk = nk.replace("downstream_head2.", "head2.")
        out[nk] = v
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="torch checkpoint (.pth)")
    parser.add_argument("output", help="output .npz path")
    parser.add_argument("--dust3r", action="store_true", help="apply vanilla-DUSt3R key remapping")
    parser.add_argument(
        "--serving",
        action="store_true",
        help="emit a native-layout DUSt3R serving checkpoint (utils/coldstart.py: "
        "kernels pre-transposed, scan-stacked, zero host transforms at load — "
        "pays the ~1 min host transpose/stack cost once here instead of per cold "
        "start). Name the output .nsv for the packed mmap-zero-copy container "
        "(fastest load); .npz keeps the numpy-interchange zip container",
    )
    parser.add_argument(
        "--model",
        default="dust3r",
        choices=["dust3r", "flow"],
        help="(--serving) which composed model the checkpoint belongs to "
        "(flow = the UFM-style UFMFlow factory)",
    )
    parser.add_argument("--img-size", type=int, default=512, help="(--serving) model image size")
    parser.add_argument("--head", default="linear", choices=["linear", "dpt"], help="(--serving) head type")
    parser.add_argument("--enc-dim", type=int, default=1024, help="(--serving) encoder width")
    parser.add_argument("--enc-depth", type=int, default=24, help="(--serving) encoder depth")
    parser.add_argument("--enc-heads", type=int, default=16, help="(--serving) encoder heads")
    parser.add_argument("--dec-dim", type=int, default=768, help="(--serving) info-sharing width")
    parser.add_argument("--dec-depth", type=int, default=12, help="(--serving) info-sharing depth")
    parser.add_argument("--dec-heads", type=int, default=12, help="(--serving) info-sharing heads")
    parser.add_argument("--no-scan", action="store_true", help="(--serving) loop layout instead of scan")
    parser.add_argument(
        "--f32",
        action="store_true",
        help="(--serving) keep f32 params (default pre-casts to bf16 — the serving "
        "dtype — which also halves checkpoint read bytes)",
    )
    parser.add_argument(
        "--int8",
        action="store_true",
        help="(--serving) w8a8-quantize the trunk linears OFFLINE (nn/quant.py) so "
        "serving cold-start skips the quantization pass and reads int8 weights "
        "(~2x fewer trunk bytes than bf16); scales stay f32",
    )
    parser.add_argument(
        "--int8-policy",
        default="all",
        help="(--int8) mixed-precision trunk policy (nn/quant.py trunk_policy "
        "grammar); layers outside the policy stay bf16",
    )
    parser.add_argument(
        "--int8-asym",
        default="none",
        help="(--int8) which quantized layers use zero-point (asymmetric) "
        "activation quantization (same grammar; default all-symmetric — "
        "the measured frontier default, BASELINE.md round 4)",
    )
    parser.add_argument(
        "--gptq",
        default=None,
        help="(--int8) npz of calibrated GPTQ codes (scripts/calibrate_gptq.py): "
        "embed them in the serving checkpoint in place of the RTN codes "
        "(-29%% int8 output error at identical throughput, BASELINE.md round 4)",
    )
    args = parser.parse_args()

    ckpt = load_checkpoint(args.input)
    model = ckpt.pop("model")
    if args.dust3r:
        model = remap_vanilla_dust3r(model)
    meta = {k: v for k, v in ckpt.items() if isinstance(v, (str, int, float, bool))}

    if args.serving:
        if args.f32 and args.int8:
            parser.error(
                "--f32 and --int8 are mutually exclusive: the online serve path "
                "quantizes from bf16 params, so an f32-sourced quantization would "
                "not be bit-identical to serve-time quantize_linears"
            )
        # metadata keys that collide with save_native_state's own parameters
        # (a torch checkpoint can legitimately carry a top-level 'dtype')
        for reserved in ("dtype", "path", "module"):
            if reserved in meta:
                meta[f"ckpt_{reserved}"] = meta.pop(reserved)
        # the converter is a host-side tool: pin jax to CPU so the int8
        # quantization math and the materialize pass never dispatch through
        # a TPU tunnel (and never touch a TPU someone else is using)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_platforms", "cpu")
        from flax import nnx

        from uniception_tpu.utils.coldstart import abstract_construct, materialize, save_native_state
        from uniception_tpu.utils.torch_compat import load_torch_state_dict

        if args.model == "flow":
            from uniception_tpu.models.factory.flow import UFMFlow

            def ctor():
                return UFMFlow(
                    name="ufm_flow_serve",
                    img_size=(args.img_size, args.img_size),
                    pred_head_type=args.head,
                    enc_embed_dim=args.enc_dim,
                    enc_depth=args.enc_depth,
                    enc_num_heads=args.enc_heads,
                    info_sharing_dim=args.dec_dim,
                    info_sharing_depth=args.dec_depth,
                    info_sharing_num_heads=args.dec_heads,
                    scan_blocks=not args.no_scan,
                    dtype=jnp.bfloat16,
                    rngs=nnx.Rngs(0),
                )
        else:
            from uniception_tpu.models.factory.dust3r import DUSt3R

            def ctor():
                return DUSt3R(
                    name="dust3r_serve",
                    img_size=(args.img_size, args.img_size),
                    patch_embed_cls="ManyAR_PatchEmbed",
                    pred_head_type=args.head,
                    enc_embed_dim=args.enc_dim,
                    enc_depth=args.enc_depth,
                    enc_num_heads=args.enc_heads,
                    info_sharing_dim=args.dec_dim,
                    info_sharing_depth=args.dec_depth,
                    info_sharing_num_heads=args.dec_heads,
                    scan_blocks=not args.no_scan,
                    dtype=jnp.bfloat16,
                    rngs=nnx.Rngs(0),
                )

        m = abstract_construct(ctor)
        load_torch_state_dict(m, model, ignore=m.checkpoint_alias_patterns(), to_device=False)
        save_dtype = None if args.f32 else jnp.bfloat16
        if args.int8:
            from uniception_tpu.nn.quant import quantize_trunk

            # mirror the online serving order exactly (examples/serve_dust3r.py):
            # cast params to the serving dtype FIRST, then quantize — so the
            # offline w_q/w_scale are bit-identical to what quantize_trunk
            # would produce at serve time, with scales in f32
            m = materialize(m, param_dtype=save_dtype)
            n_q = quantize_trunk(m, args.int8_policy, asym=args.int8_asym)
            n_gptq = 0
            if args.gptq:
                from uniception_tpu.nn.gptq import apply_gptq, load_gptq_npz

                n_gptq = apply_gptq(m, load_gptq_npz(args.gptq))
                print(f"embedded GPTQ codes for {n_gptq} layers from {args.gptq}")
            meta = {
                **meta,
                "quant": "int8-w8a8-dynamic",
                "quant_layers": n_q,
                "quant_gptq_layers": n_gptq,
                # recorded so the serve loader reconstructs the SAME module
                # tree (policy decides which layers are Int8Linear; asym
                # decides which of those carry a w_colsum leaf)
                "quant_policy": args.int8_policy,
                "quant_asym": args.int8_asym,
            }
            save_dtype = None  # per-leaf dtypes are already the serving dtypes
        save_native_state(args.output, m, dtype=save_dtype, **meta)
        kind = "int8" if args.int8 else ("f32" if args.f32 else "bf16")
        print(f"Wrote native serving checkpoint {args.output} ({kind})")
        return

    save_checkpoint(args.output, model, **meta)
    print(f"Wrote {args.output} with {len(model)} tensors, metadata={meta}")


if __name__ == "__main__":
    main()
