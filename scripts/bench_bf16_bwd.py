"""Speed A/B: full train step with f32 vs bf16 backward one-hot.

Measures through the SAME fused-dispatch harness as bench.py (the
standalone backward-kernel jit wedges this fabric's compile service, so
the full step is the reliable vehicle; the step contains exactly one
backward kernel)."""

import sys

sys.path.insert(0, "/root/repo")

from bench import measure  # noqa: E402


def main():
    base = dict(w_warp=0.0, w_depth=0.0, w_smooth=0.0, rho=0.0)
    r_f32 = measure(dict(**base, hash_bwd_bf16=False))
    print(f"rgb-only f32 one-hot: {r_f32:.1f} rays/s", flush=True)
    r_bf16 = measure(dict(**base, hash_bwd_bf16=True))
    print(f"rgb-only bf16 one-hot: {r_bf16:.1f} rays/s "
          f"({r_bf16 / r_f32:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
