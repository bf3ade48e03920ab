"""Analytic per-bucket floor table for a ScOT family member (default L, b64).

CPU-only companion to scripts/trace_accounting.py: enumerates every GEMM
family in the train step (fwd + bwd + AdamW) from the config's shapes and
prices it against the MEASURED achievable rates on one v5e chip
(BASELINE.md round-3: 137 TF/s bf16 GEMM = 70% of nominal; ~819 GB/s HBM;
attention softmax VPU floor scaled from the measured 347 us/layer stage-0
forward probe at T=256). The output is the "honest floor" column the
round-3 B accounting established, recomputed for L's shapes — the bucket
weights move a lot: K=192..1536 contractions lift MXU efficiency, the
628.6M-param optimizer sweep becomes a first-class bucket, and the VPU
softmax work stays EQUAL to B's per sample (same head counts 3/6/12/24,
only head_dim doubles).

Run: python scripts/l_floor.py [--size L] [--batch 64]
"""

import argparse

GEMM_TFS = 137e12   # measured achievable bf16 GEMM rate (BASELINE.md r3)
HBM_GBS = 819e9     # v5e HBM bandwidth
NOMINAL = 197e12


def stage_geometry(embed_dim, image_size=128, patch=4, window=16,
                   heads=(3, 6, 12, 24)):
    """Per-stage (resolution, tokens, channels, window_T, n_windows, heads)."""
    out = []
    res = image_size // patch
    for s in range(4):
        c = embed_dim * (2 ** s)
        w = min(window, res)
        out.append(dict(res=res, tokens=res * res, c=c, t=w * w,
                        nwin=(res // w) ** 2, heads=heads[s]))
        res //= 2
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="L")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--depths", type=int, default=8)
    args = ap.parse_args()

    embed = {"T": 48, "S": 48, "B": 96, "L": 192}[args.size]
    depth = 4 if args.size == "T" else args.depths
    b = args.batch
    stages = stage_geometry(embed)

    # Train-step multiplier for a GEMM: fwd + dgrad + wgrad = 3x fwd MACs.
    # The pallas MLP/attention backwards recompute the forward instead of
    # stashing (one extra fwd-sized pass); approximate all GEMM families at
    # 3x and count recompute separately where it is known to exist.
    f = {}
    f_mlp = f_qkvproj = f_attn = f_cpb = f_cond = 0.0
    vpu_scores = 0.0  # number of score elements (softmax/VPU work proxy)
    # Encoder + decoder both run `depth` blocks per stage (decoder mirrors).
    for si, st in enumerate(stages):
        blocks = depth * (2 if si < 3 else 1) + (depth if si == 3 else 0)
        # stage 3 appears once (bottleneck); stages 0-2 in encoder+decoder.
        # ScOT: encoder stages 0..3, decoder stages mirror 2..0 -> stage 3
        # runs depth blocks, stages 0..2 run 2*depth.
        L, C, T, H = st["tokens"], st["c"], st["t"], st["heads"]
        per_block_mlp = 2 * L * C * 4 * C * 2           # two GEMMs, MACs*2
        per_block_qkv = 2 * L * C * 3 * C + 2 * L * C * C
        per_block_attn = 2 * L * T * C * 2              # scores + AV
        ncoords = (2 * int(T ** 0.5) - 1) ** 2
        per_block_cpb = 2 * ncoords * (2 * 512 + 512 * H)
        per_block_cond = 2 * b * (1 * C + C) * 4        # 2 CLNs x scale+shift
        f_mlp += blocks * per_block_mlp * b
        f_qkvproj += blocks * per_block_qkv * b
        f_attn += blocks * per_block_attn * b
        f_cpb += blocks * per_block_cpb                 # batch-independent
        f_cond += blocks * per_block_cond
        vpu_scores += blocks * H * st["nwin"] * T * T * b

    # Patch ops: embed 4ch*16px -> C0; merge/unmerge between stages; recovery.
    L0, C0 = stages[0]["tokens"], stages[0]["c"]
    f_patch = 2 * b * L0 * (4 * 16) * C0                       # embed
    for si in range(3):
        Li, Ci = stages[si + 1]["tokens"], stages[si]["c"]
        f_patch += 2 * b * Li * (4 * Ci) * (2 * Ci)            # merge
        f_patch += 2 * b * Li * (2 * Ci) * (4 * Ci)            # unmerge
    f_patch += 2 * b * L0 * C0 * (4 * 16)                      # recovery
    f_patch += 2 * b * (128 * 128) * (5 * 5 * 4) * 4           # 5x5 mixup

    train_x = 3.0
    buckets = {
        "block MLP GEMMs": f_mlp * train_x,
        "QKV+proj GEMMs": f_qkvproj * train_x,
        "attention matmuls (scores+AV)": f_attn * (train_x + 1),  # recompute
        "patch embed/merge/unmerge/recovery": f_patch * train_x,
        "CPB + cond-MLP GEMMs": (f_cpb + f_cond) * train_x,
    }
    total_gemm = sum(buckets.values())

    # Non-GEMM floors:
    # - softmax VPU: B stage-0 fwd probe measured 347 us/layer at
    #   H*nwin*T^2*b96 = 3*4*256^2*96 score elements (fwd); scale linearly,
    #   x2.5 for bwd recompute + dsoftmax.
    b_probe_elems = 3 * 4 * 256 * 256 * 96
    vpu_ms = 0.347 * (vpu_scores / b_probe_elems) * 2.5
    # - optimizer: AdamW fp32 p/m/v read+write + fp32 grad read.
    n_params = {"T": 17.6e6, "S": 38.6e6, "B": 157.7e6, "L": 628.6e6}[args.size]
    opt_ms = n_params * (6 * 4 + 4) / HBM_GBS * 1e3
    # - norms/copies/convs/misc: scale B's measured floors (~10+8+5+10 ms at
    #   b96) by batch and channel width for the activation-traffic part.
    act_scale = (b / 96) * (embed / 96)
    misc_ms = (10 + 8 + 5 + 10) * act_scale

    print(f"ScOT-{args.size} b{b}: analytic GEMM buckets (train = 3x fwd MACs)")
    rows = []
    for k, v in buckets.items():
        ms = v / GEMM_TFS * 1e3
        rows.append((k, v / 1e12, ms))
        print(f"  {k:44s} {v/1e12:7.2f} TF  {ms:7.1f} ms @137TF/s")
    gemm_ms = total_gemm / GEMM_TFS * 1e3
    print(f"  {'TOTAL GEMM':44s} {total_gemm/1e12:7.2f} TF  {gemm_ms:7.1f} ms")
    print(f"  softmax/VPU floor (scaled from B probe)      "
          f"{vpu_ms:7.1f} ms  ({vpu_scores/1e9:.2f} G score elems)")
    print(f"  optimizer HBM sweep ({n_params/1e6:.1f}M params)   "
          f"{opt_ms:7.1f} ms")
    print(f"  norms/copies/convs/misc (scaled from B)      {misc_ms:7.1f} ms")
    floor_ms = gemm_ms + vpu_ms + opt_ms + misc_ms
    print(f"  => honest floor ~{floor_ms:.0f} ms "
          f"-> {b / floor_ms * 1e3:.0f} samples/s")
    # MFU at the floor, using 3x-fwd GEMM flops as the model-flop numerator
    # (cost_analysis counts more; this is the conservative bound).
    print(f"  floor nominal-MFU ~{total_gemm / (floor_ms / 1e3) / NOMINAL:.1%}"
          f"  (peak nominal {NOMINAL/1e12:.0f} TF/s)")


if __name__ == "__main__":
    main()
