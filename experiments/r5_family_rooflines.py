"""Round-5: analytic HBM bytes/image budgets + rooflines for the three
families the round-4 verdict flagged as unprofiled-in-depth: efficientnet_b0,
mobilenetv3_large_100, densenet121 (VERDICT r4 task #1).

Method = the audited ResNet-50 budget (experiments/r3_bytes_budget.py): walk
the model spec, apply the optimized-HLO fusion accounting rules the round-2/3
device profiles established, convert bytes to time at the DELIVERED
bandwidths (462 GB/s elementwise / 367 GB/s reduce-heavy, PERF.md round-2),
and compare to the measured device step time. Pure math — no TPU needed.

Accounting rules (per conv+BN unit, bf16 activations):
  fwd     read a_in + write a_out (BN apply + act fuse into the conv epilogue;
          BN batch stats ride the same write pass)
  bwd dX  read grad_out + saved out (BN bwd + act-mask recompute) + write
          grad_in = 2*a_out + a_in
  dW      read a_in + read grad_out
  params  fp32 master read + bf16 cast (fwd+bwd) + grad write + SGD update
  augment uint8 read + bf16 write
  head    pool fwd/bwd + dense fwd/bwd

Family-specific bands (stated, not hidden):
  SE blocks    LOW band: pool read + grad re-read (2a — scale multiply fuses
               into the pointwise conv's operand read); HIGH band: unfused
               scale apply (read a + write a fwd, + read a bwd -> 5a)
  DenseNet     pre-activation BN: LOW band reads the input twice (stats pass
               + normalize fused into the conv read); HIGH adds a
               materialized normalized tensor (3a_in). Concat: fwd read
               c + g, write c+g; bwd LOW = slices fuse into consumers (free),
               HIGH = read a(c+g) + write both slices.

Run: python experiments/r5_family_rooflines.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BS = 64
BF16 = 2
F32 = 4
U8 = 1
BW_ELEM = 462e9   # delivered, chained elementwise (PERF.md round-2)
BW_REDUCE = 367e9  # delivered, reduce-heavy
# these programs are ~55% convert_reduce (r3 profiles) -> blended central BW
BW_MID = 0.55 * BW_REDUCE + 0.45 * BW_ELEM

# measured device ms/step under shipped defaults (bs=64 @224 bf16, scan K=4,
# chip idle) — refreshed by experiments/r5_family_profiles.py this round
MEASURED_DEVICE_MS = {
    "efficientnet_b0": 17.7,       # r3 trace, reconfirmed r5 (17.8)
    "mobilenetv3_large_100": 10.5,  # r3 trace, reconfirmed r5 (10.6)
    "densenet121": 33.0,           # r5 trace (19.1% slice/concat/pad)
}


def act(hw, c, dtype=BF16):
    return BS * hw * hw * c * dtype


def conv_unit(hw_in, cin, hw_out, cout):
    """(fwd, bwd_dx, dw) bytes for one conv+BN(+act) unit."""
    a_in, a_out = act(hw_in, cin), act(hw_out, cout)
    return a_in + a_out, 2 * a_out + a_in, a_in + a_out


def conv_flops(hw_out, k, cin, cout, groups=1):
    return 2 * BS * hw_out * hw_out * k * k * (cin // groups) * cout


def se_bytes(hw, c):
    """(low, high) SE-block bytes at (hw, c)."""
    a = act(hw, c)
    return 2 * a, 5 * a


class Budget:
    def __init__(self, name):
        self.name = name
        self.rows = {}          # category -> [low, high]
        self.flops = 0
        self.n_params = 0

    def add(self, cat, low, high=None):
        high = low if high is None else high
        r = self.rows.setdefault(cat, [0, 0])
        r[0] += low
        r[1] += high

    def add_unit(self, hw_in, cin, hw_out, cout, k=1, groups=1):
        f, b, w = conv_unit(hw_in, cin, hw_out, cout)
        self.add("fwd conv stores", f)
        self.add("bwd dX pipelines", b)
        self.add("dW conv reads", w)
        self.flops += 3 * conv_flops(hw_out, k, cin, cout, groups)  # fwd+dX+dW
        self.n_params += k * k * (cin // groups) * cout

    def finish(self, head_c, emb=None):
        self.add("params+optimizer",
                 self.n_params * (F32 + BF16) * 2 + self.n_params * F32 * 3)
        self.add("augment", BS * 224 * 224 * 3 * (U8 + BF16))
        pooled = BS * head_c * BF16
        self.add("head", 2 * (act(7, head_c) + pooled)
                 + 3 * BS * 1000 * F32 + 2 * head_c * 1000 * F32)

    def report(self):
        print(f"\n=== {self.name} (bs={BS} @224 bf16 train step) ===")
        lo = sum(v[0] for v in self.rows.values())
        hi = sum(v[1] for v in self.rows.values())
        print(f"{'category':24s} {'GB lo':>7s} {'GB hi':>7s} {'MB/img':>7s}")
        for k, (l, h) in sorted(self.rows.items(), key=lambda kv: -kv[1][1]):
            print(f"{k:24s} {l/1e9:7.2f} {h/1e9:7.2f} {h/BS/1e6:7.1f}")
        print(f"{'TOTAL':24s} {lo/1e9:7.2f} {hi/1e9:7.2f}")
        mxu_ms = self.flops / 125e12 * 1e3  # measured large-matmul rate
        bw_lo_ms = lo / BW_ELEM * 1e3       # optimistic: all-elementwise BW
        bw_mid_ms = (lo + hi) / 2 / BW_MID * 1e3
        bw_hi_ms = hi / BW_REDUCE * 1e3
        print(f"train FLOPs {self.flops/BS/1e9:.2f} GFLOP/img -> MXU floor "
              f"{mxu_ms:.1f} ms/step (@125 TFLOP/s measured; small convs are "
              f"slower, so this floor is generous)")
        print(f"bandwidth floor: {bw_lo_ms:.1f} (lo budget @462) / "
              f"{bw_mid_ms:.1f} (mid @{BW_MID/1e9:.0f}) / {bw_hi_ms:.1f} "
              f"(hi @367) ms/step")
        meas = MEASURED_DEVICE_MS.get(self.name)
        if meas:
            print(f"measured device: {meas:.1f} ms/step -> "
                  f"{meas*1e-3*BW_MID/1e9:.1f} GB at blended BW; "
                  f"roofline mid/measured = {bw_mid_ms/meas*100:.0f}%")
        return lo, hi, mxu_ms, (bw_lo_ms, bw_mid_ms, bw_hi_ms)


def efficientnet_b0():
    from nkbx.models.efficientnet import _B0_SPEC, _round_channels

    b = Budget("efficientnet_b0")
    hw, c = 112, _round_channels(32, 1.0)
    b.add_unit(224, 3, 112, c, k=3)                      # stem
    for expand, k, stride, repeats, out in _B0_SPEC:
        out_c = _round_channels(out, 1.0)
        for i in range(repeats):
            s = stride if i == 0 else 1
            mid = c * expand
            hw_out = hw // s
            if expand != 1:
                b.add_unit(hw, c, hw, mid, k=1)          # conv_pw
            b.add_unit(hw, mid, hw_out, mid, k=k, groups=mid)  # dw
            lo, hi = se_bytes(hw_out, mid)               # SE on dw output
            b.add("SE blocks", lo, hi)
            b.add_unit(hw_out, mid, hw_out, out_c, k=1)  # conv_pwl
            hw, c = hw_out, out_c
    b.add_unit(hw, c, hw, 1280, k=1)                     # head conv
    b.finish(1280)
    return b


def mobilenetv3_large():
    from nkbx.models.common import make_divisible
    from nkbx.models.mobilenetv3 import _LARGE_SPEC

    b = Budget("mobilenetv3_large_100")
    hw, c = 112, make_divisible(16)
    b.add_unit(224, 3, 112, c, k=3)
    for k, e, o, se, _a, s in _LARGE_SPEC:
        e, o = make_divisible(e), make_divisible(o)
        hw_out = hw // s
        if e != c:
            b.add_unit(hw, c, hw, e, k=1)
        b.add_unit(hw, e, hw_out, e, k=k, groups=e)
        if se:
            lo, hi = se_bytes(hw_out, e)
            b.add("SE blocks", lo, hi)
        b.add_unit(hw_out, e, hw_out, o, k=1)
        hw, c = hw_out, o
    b.add_unit(hw, c, hw, 960, k=1)                      # last conv
    b.finish(960)
    b.n_params += 960 * 1280                             # post-pool dense
    return b


def densenet121():
    b = Budget("densenet121")
    b.add_unit(224, 3, 112, 64, k=7)                     # stem
    b.add("stem pool", act(112, 64) + act(56, 64),        # maxpool fwd
          act(112, 64) + act(56, 64) + act(56, 64) + act(112, 64))  # +bwd
    hw, c = 56, 64
    for bi, n_layers in enumerate((6, 12, 24, 16)):
        for _ in range(n_layers):
            # pre-activation BN before each conv: stats pass = extra a_in read
            b.add("preact BN extra reads", act(hw, c), 2 * act(hw, c))
            b.add_unit(hw, c, hw, 128, k=1)              # bottleneck 1x1
            b.add("preact BN extra reads", act(hw, 128), 2 * act(hw, 128))
            b.add_unit(hw, 128, hw, 32, k=3)             # 3x3 growth conv
            # concat: fwd read a(c) + a(32), write a(c+32) = 2*a(c+32) total;
            # bwd grad-slices fuse into consumers (LOW) or materialize (HIGH)
            cc = act(hw, c + 32)
            b.add("concat", 2 * cc, 4 * cc)
            c += 32
        if bi != 3:
            b.add("preact BN extra reads", act(hw, c), 2 * act(hw, c))
            b.add_unit(hw, c, hw, c // 2, k=1)           # transition conv
            c //= 2
            b.add("transition pool", act(hw, c) + act(hw // 2, c),
                  2 * (act(hw, c) + act(hw // 2, c)))
            hw //= 2
    b.add("preact BN extra reads", act(hw, c), 2 * act(hw, c))  # final norm
    b.finish(c)
    return b


if __name__ == "__main__":
    for fn in (efficientnet_b0, mobilenetv3_large, densenet121):
        fn().report()
