"""Parse rl/train.py logs into a CSV + markdown learning-curve summary.

Usage: python scripts/plot_training.py LOG [LOG...] --out docs/training_collect
Writes <out>.csv (steps, sps, loss, reward, entropy) and <out>.md (table of
reward_mean over training milestones — the reward-goes-up demonstration).
"""

import argparse
import csv
import re
from pathlib import Path

ROW = re.compile(
    r"steps ([\d,]+)\s+([\d,]+) env-steps/s\s+task (\S+)\s+loss ([-\d.]+)\s+"
    r"reward ([-\d.]+)\s+entropy ([-\d.]+)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    rows = []
    for log in args.logs:
        for line in Path(log).read_text().splitlines():
            m = ROW.search(line)
            if m:
                rows.append({
                    "steps": int(m.group(1).replace(",", "")),
                    "sps": int(m.group(2).replace(",", "")),
                    "task": m.group(3),
                    "loss": float(m.group(4)),
                    "reward_mean": float(m.group(5)),
                    "entropy": float(m.group(6)),
                })
    rows.sort(key=lambda r: r["steps"])
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out.with_suffix(".csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # milestone table: ~12 evenly spaced points
    n = len(rows)
    picks = sorted({int(i * (n - 1) / 11) for i in range(12)})
    lines = [
        f"# Training curve: {rows[0]['task']}",
        "",
        f"{n} logged points, {rows[-1]['steps']:,} env steps total "
        f"({rows[-1]['sps']:,} env-steps/s sustained at the end).",
        "",
        "| env steps | reward_mean | entropy | loss |",
        "|---|---|---|---|",
    ]
    for i in picks:
        r = rows[i]
        lines.append(f"| {r['steps']:,} | {r['reward_mean']:+.4f} "
                     f"| {r['entropy']:.3f} | {r['loss']:.4f} |")
    first, last = rows[0], rows[-1]
    lines += [
        "",
        f"reward_mean {first['reward_mean']:+.4f} -> {last['reward_mean']:+.4f} "
        f"over {last['steps'] - first['steps']:,} steps.",
    ]
    out.with_suffix(".md").write_text("\n".join(lines) + "\n")
    print(f"wrote {out.with_suffix('.csv')} and {out.with_suffix('.md')} "
          f"({n} rows)")


if __name__ == "__main__":
    main()
