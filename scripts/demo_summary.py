"""Summarize an advmix_demo.sh run: read the two sweep CSVs written by
tools/test_corruption.py (write_final_csv) and print clean / mPC / rPC
per arm plus the rPC delta.

Kept as a file (not a heredoc) so tests can run it against fixture CSVs
with the real column names — write_final_csv names columns by dataset
family ("clean_mAP"/"mean_corrupted_mAP" for COCO and synthetic,
"clean_mean"/"mean_corrupted_mean" for MPII) regardless of the
evaluator's metric label, and a summary reading the wrong key silently
prints zeros.

Usage: python scripts/demo_summary.py <workdir>
"""

import csv
import glob
import sys


def read_arm(work, tag):
    path = sorted(glob.glob(f"{work}/results_{tag}.csv"))[-1]
    with open(path) as f:
        r = list(csv.DictReader(f))[-1]

    def col(prefix):
        for k in (f"{prefix}_mAP", f"{prefix}_mean", f"{prefix}_PCK"):
            if k in r:
                return float(r[k])
        raise KeyError(f"no {prefix}_* column in {path}: {list(r)}")

    clean = col("clean")
    mpc = col("mean_corrupted")
    return clean, mpc, (mpc / clean if clean else 0.0)


def main(work):
    print("\n=== AdvMix robustness demo summary ===")
    rows = {}
    tags = ["standard", "advmix"]
    # equal-optimization-budget control (VERDICT r3 weak #8): a standard
    # arm trained the same TOTAL epochs as standard-then-advmix, so the
    # advmix deltas aren't confounded with the extra fine-tune epochs
    if glob.glob(f"{work}/results_standard400.csv"):
        tags.insert(1, "standard400")
    for tag in tags:
        clean, mpc, rpc = read_arm(work, tag)
        rows[tag] = (clean, mpc, rpc)
        print(f"{tag:12s} clean={clean:.4f}  mPC={mpc:.4f}  rPC={rpc:.4f}")
    control = "standard400" if "standard400" in rows else "standard"
    d = rows["advmix"][2] - rows[control][2]
    print(f"rPC delta (advmix - {control}): {d:+.4f}")
    dm = rows["advmix"][1] - rows[control][1]
    print(f"mPC delta (advmix - {control}): {dm:+.4f}")
    return rows


if __name__ == "__main__":
    main(sys.argv[1])
