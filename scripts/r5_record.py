"""Turn the round-5 conjunction verdict JSON into the documents of record.

Reads _runs/r5x16/verdict.json (written by scripts/r5_verdict.sh) plus the
segment train logs, then:
  1. inserts a "Round 5: conjunction verdict of record" section at the top
     of PERF.md (verdict JSON verbatim + interpretation + final val curve);
  2. appends a "Measured results (round 5)" section to BASELINE.md;
  3. rewrites README.md footnote 1's final-verdict sentence.

Idempotent-ish: refuses to run twice (checks for the PERF.md marker).
Run by scripts/r5_autocommit.sh so the record lands even unattended.
"""
import json
import pathlib
import subprocess
import sys

import os
REPO = pathlib.Path(os.environ.get("R5_RECORD_REPO",
                                   pathlib.Path(__file__).resolve().parents[1]))
RUN = pathlib.Path(os.environ.get("R5_RECORD_RUN", "/root/repo/_runs"))
MARKER = "## Round 5: conjunction verdict of record"


def fmt(v, nd=4):
    return "null" if v is None else f"{v:.{nd}f}" if isinstance(v, float) else str(v)


def main():
    verdict = json.loads((RUN / "r5x16" / "verdict.json").read_text())
    perf = (REPO / "PERF.md").read_text()
    if MARKER in perf:
        print("PERF.md already has the verdict section; not rewriting")
        return 0

    # seg.seg*.log = original segmented run; segb.seg*.log = the post-hang
    # relaunch of the final stretch (TODO.md live state) — the curve wants both.
    seg_logs = (sorted(RUN.glob("seg.seg*.log")) + sorted(RUN.glob("segb.seg*.log"))
                + sorted(RUN.glob("r5x16.seg*.log")))
    curve = ""
    if seg_logs:
        try:
            curve = subprocess.run(
                [sys.executable, str(REPO / "scripts" / "val_curve.py"),
                 *map(str, seg_logs)],
                capture_output=True, text=True, timeout=120).stdout.strip()
        except Exception as e:  # curve is evidence, not the verdict
            curve = f"(val_curve.py failed: {e})"

    ratio = verdict.get("map_parity_ratio")
    r50 = verdict.get("map50_parity_ratio")
    tps = verdict.get("tiles_per_sec_b16")
    meets_p = verdict.get("meets_parity")
    meets_5x = verdict.get("meets_5x")
    partial = verdict.get("partial") or []

    if partial:
        head = (f"**PARTIAL verdict** — legs missing: {partial}. "
                "Treat the conjunction as NOT closed by this line.")
    elif meets_p and meets_5x:
        head = ("**The north-star conjunction CLOSES**: the checkpoint-compat "
                "crop tier serves the trained full-canvas weights at "
                f"mAP parity ratio {fmt(ratio)} (AP50 ratio {fmt(r50)}) while "
                f"sustaining {fmt(tps, 1)} tiles/sec (target ≥125 = 5× the "
                "documented A100 analytic estimate).")
    else:
        legs = []
        legs.append(f"parity {'PASS' if meets_p else 'FAIL'} "
                    f"(AP ratio {fmt(ratio)}, AP50 ratio {fmt(r50)}, "
                    "threshold 0.99)")
        legs.append(f"throughput {'PASS' if meets_5x else 'FAIL'} "
                    f"({fmt(tps, 1)} t/s, threshold 125)")
        head = ("**Conjunction verdict: " +
                ("PASS" if (meets_p and meets_5x) else "FAIL") + "** — " +
                "; ".join(legs) + ". If parity failed, the fallback serving "
                "config remains the measured mAP-exact full-canvas bf16 tier "
                "(66.3 t/s, 2.65×); see the tier ladder below.")

    section = f"""{MARKER}

Fresh from-scratch 60-epoch x16 run entirely under reboot-proof
`_runs/` (recipe: ViT-B, `--train_encoder --use_amp --clip_max_norm 1.0
--batch_size 8 --aux_loss --fix_hw_swap --best_metric val_ap`, lr 1e-4
drop x0.1 @40, segmented SEG=20, 928 synthetic x16 tiles/epoch), then
`scripts/conjunction.py --orbax_checkpoint _runs/r5x16/best_checkpoint`
on the real chip. Both tiers scored against the same real annotations
with the frame fix (`--fix_hw_swap`); drift legs are
detections-vs-detections. The verdict line (also committed verbatim as
`VERDICT_R5_RUN.json`):

```json
{json.dumps(verdict)}
```

{head}

Final val curve of the verdict run (train loss; val AP/AP50 on eval
epochs, frame-fixed):

```
{curve}
```

"""
    perf = perf.replace("# Performance notes\n\n",
                        "# Performance notes\n\n" + section, 1)
    (REPO / "PERF.md").write_text(perf)

    base = (REPO / "BASELINE.md").read_text()
    if "Measured results (round 5)" not in base:
        base += f"""
## Measured results (round 5)

Trained-checkpoint conjunction verdict (60-epoch from-scratch run —
partially converged; the reference schedule of record is 550 epochs —
see PERF.md for the full record; `VERDICT_R5_RUN.json` for the raw
line). Synthetic x16 val tiles (real Mara geometry/counts/classes);
the real-checkpoint gate stays queued behind egress. Caveat: at
moderate absolute AP the @[.5:.95] ratio carries localization noise;
read it together with the AP50 ratio and the drift legs.

| Leg | Target | Measured | Verdict |
|---|---|---|---|
| crop/full mAP parity (same weights, real-GT AP ratio) | ≥ 0.99 | {fmt(ratio)} (AP50 ratio {fmt(r50)}) | {"PASS" if meets_p else ("n/a" if meets_p is None else "FAIL")} |
| crop-tier throughput, B=16, v5e | ≥ 125 t/s (5× analytic A100 est.) | {fmt(tps, 1)} t/s | {"PASS" if meets_5x else ("n/a" if meets_5x is None else "FAIL")} |
"""
        (REPO / "BASELINE.md").write_text(base)

    readme_p = REPO / "README.md"
    readme = readme_p.read_text()
    old = ("Final\nparity of record (crop/full AP ratio on a converged "
           "checkpoint) is the\nTPU pipeline's stage-4 verdict; the 66.3 "
           "t/s full-canvas tier (table\nabove) is the measured mAP-exact "
           "configuration either way.")
    if partial:
        new = ("The round-5 trained-checkpoint verdict was PARTIAL "
               f"(missing legs: {partial}; `VERDICT_R5_RUN.json`); the 66.3 "
               "t/s full-canvas tier (table above) is the measured "
               "mAP-exact configuration either way.")
    elif meets_p:
        new = ("Parity of record (round 5, 60-epoch trained checkpoint — "
               "partially converged; the reference schedule is 550 epochs — "
               f"real-GT AP ratio, frame-fixed): **{fmt(ratio)}** (AP50 "
               f"ratio {fmt(r50)}) at {fmt(tps, 1)} tiles/sec "
               "(`VERDICT_R5_RUN.json`, PERF.md round 5).")
    else:
        new = ("The round-5 trained-checkpoint (60-epoch) verdict read AP ratio "
               f"{fmt(ratio)} (AP50 ratio {fmt(r50)}) — below the 0.99 bar; "
               "serve released checkpoints on the measured mAP-exact "
               "full-canvas bf16 tier (66.3 t/s, table above). "
               "`VERDICT_R5_RUN.json`, PERF.md round 5.")
    if old in readme:
        readme_p.write_text(readme.replace(old, new, 1))
    else:
        print("README footnote sentence not found verbatim; leaving README")
    print("record written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
