"""Analytic HBM bytes/image budget for the ResNet-50 @224 bf16 train step
(VERDICT r2 item 1c): per-category traffic derived from layer shapes, cross-
checked against the measured step time at the delivered bandwidth. Pure math —
no TPU needed. Categories follow the optimized-HLO fusion structure PERF.md's
round-2 profile established:

  fwd     conv reads input + writes conv output (BN-apply/relu fuse into the
          epilogue; the PRE-BN conv output is the saved tensor)
  bwd dX  fused backward pipeline reads grad_out + saved conv output (BN bwd +
          relu-mask recompute) and writes grad_in
  dW      dW conv reads the layer input + grad_out (weight grads are tiny)
  params  fp32 master read + bf16 cast read (fwd+bwd) + grad write + SGD update
  stem    s2d conv + maxpool (+ the measured 115 MB layout copy)
  augment uint8 read + bf16 normalized write
  head    pool/dense forward+backward

Run: python experiments/r3_bytes_budget.py
"""

BS = 128
BF16 = 2
F32 = 4


def resnet50_convs():
    """(name, in_hw, out_hw, cin, cout) for every conv after the stem."""
    convs = []
    stages = [(3, 64, 56), (4, 128, 28), (6, 256, 14), (3, 512, 7)]
    in_c = 64  # after stem+maxpool, 56x56
    in_hw = 56
    for si, (n_blocks, width, out_hw) in enumerate(stages):
        out_c = width * 4
        for b in range(n_blocks):
            stride_hw = in_hw if (si == 0 or b > 0) else in_hw
            # block input spatial: first block of stages 1-3 downsamples
            blk_in_hw = in_hw if b == 0 else out_hw
            convs.append((f"s{si}b{b}c1", blk_in_hw, blk_in_hw, in_c if b == 0 else out_c, width))
            convs.append((f"s{si}b{b}c2", blk_in_hw, out_hw, width, width))
            convs.append((f"s{si}b{b}c3", out_hw, out_hw, width, out_c))
            if b == 0:
                convs.append((f"s{si}b{b}ds", blk_in_hw, out_hw, in_c, out_c))
        in_c = out_c
        in_hw = out_hw
    return convs


def act(hw, c, dtype=BF16):
    return BS * hw * hw * c * dtype


def main():
    convs = resnet50_convs()
    fwd = bwd_dx = dw = 0
    for _name, in_hw, out_hw, cin, cout in convs:
        a_in = act(in_hw, cin)
        a_out = act(out_hw, cout)
        fwd += a_in + a_out            # read input, write conv out
        bwd_dx += 2 * a_out + a_in     # read grad_out + saved out, write grad_in
        dw += a_in + a_out             # read input + grad_out
    n_params = 25.5e6
    params = n_params * (F32 + BF16) * 2 + n_params * F32 * 3
    # stem: s2d conv fwd (uint8->bf16 in, 112^2x64 out) + dW + maxpool fwd/bwd
    stem_in = BS * 224 * 224 * 3
    stem_out = act(112, 64)
    pool_out = act(56, 64)
    copies = 115e6  # measured optimized-HLO copy inventory (PERF.md r2)
    stem = (stem_in * BF16 + stem_out) + (stem_in * BF16 + stem_out) \
        + (stem_out + pool_out) + (stem_out + 2 * pool_out) + copies
    augment = stem_in * 1 + stem_in * BF16
    head = 2 * (act(7, 2048) + BS * 2048 * BF16) + 3 * BS * 1000 * F32 \
        + 2 * 2048 * 1000 * F32
    rows = [("fwd conv stores", fwd), ("bwd dX pipelines", bwd_dx),
            ("dW conv reads", dw), ("params+optimizer", params),
            ("stem+maxpool+copies", stem), ("augment", augment), ("head", head)]
    total = sum(v for _, v in rows)
    print(f"{'category':24s} {'GB/step':>8s} {'MB/img':>7s} {'%':>5s}")
    for name, v in rows:
        print(f"{name:24s} {v / 1e9:8.2f} {v / BS / 1e6:7.1f} {v / total * 100:5.1f}")
    print(f"{'TOTAL':24s} {total / 1e9:8.2f} {total / BS / 1e6:7.1f}")
    print()
    print(f"measured: 47.3 ms/step at 462 GB/s delivered -> "
          f"{47.3e-3 * 462:.1f} GB/step moved")
    print(f"analytic / measured = {total / 1e9 / (47.3e-3 * 462) * 100:.0f}%")


if __name__ == "__main__":
    main()
