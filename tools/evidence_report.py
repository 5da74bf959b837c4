"""Generate EVIDENCE.md: per-query external-evidence matrix.

For every registered query: does it carry an oracle, which driver
round last sampled it (CORRECTNESS_r*.json), and what that row said —
the table the per-round audit otherwise reconstructs by hand. Run
after a driver round lands:

    python tools/evidence_report.py        # writes EVIDENCE.md itself

The script writes the file atomically (temp + rename) rather than
relying on a caller capturing stdout — ADVICE r5: bench.py's old
stdout-capture path would have silently corrupted EVIDENCE.md if any
incidental print/warning ever joined the report on stdout.
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build_report(repo_dir: str | None = None) -> str:
    from dumbo_spark.registry import QUERIES

    rounds: dict[str, dict] = {}
    for path in sorted(
        glob.glob(os.path.join(repo_dir or _REPO, "CORRECTNESS_r*.json"))
    ):
        rnd = os.path.basename(path).split("_r")[1].split(".")[0]
        with open(path) as f:
            rounds[rnd] = json.load(f)

    lines: list[str] = []
    lines.append("# EVIDENCE — external correctness rows per query\n")
    lines.append(
        f"{len(QUERIES)} registered queries; driver rounds seen: "
        f"{', '.join('r' + r for r in rounds)}. 'latest row' is the most "
        "recent driver sample; queries without one are locally "
        "oracle-verified only (tests/test_differential.py) and queue in "
        "_DRIVER_PRIORITY for the next rotation.\n"
    )
    lines.append("| query | oracle | latest row | verdict |")
    lines.append("|---|---|---|---|")
    counts = {"full": 0, "rows_only": 0, "never": 0, "fail": 0, "promoted": 0}
    for name in sorted(QUERIES):
        has_oracle = QUERIES[name].oracle is not None
        latest = None
        for rnd in sorted(rounds, reverse=True):
            if name in rounds[rnd]:
                latest = (rnd, rounds[rnd][name])
                break
        if latest is None:
            verdict = "local-only"
            counts["never"] += 1
            row = "—"
        else:
            rnd, rec = latest
            row = f"r{rnd}"
            if rec.get("err") == "no_oracle":
                if has_oracle:
                    # oracle added AFTER the last driver sample (e.g.
                    # the r11 promotions): locally hash-verified, the
                    # external row upgrades at its next rotation slot
                    verdict = "rows-only pass; oracle since added"
                    counts["promoted"] += 1
                else:
                    verdict = "rows-only pass"
                    counts["rows_only"] += 1
            elif rec.get("hash_match"):
                verdict = "full pass"
                counts["full"] += 1
            elif rec.get("err"):
                verdict = f"ERR: {rec['err'][:40]}"
                counts["fail"] += 1
            else:
                verdict = "FAIL"
                counts["fail"] += 1
        lines.append(
            f"| {name} | {'✓' if has_oracle else 'rows-only'} | {row} | {verdict} |"
        )
    lines.append(
        f"\nTotals: {counts['full']} full external passes, "
        f"{counts['rows_only']} rows-only by design, "
        f"{counts['promoted']} promoted since their last external row "
        f"(oracle-verified locally, awaiting re-sample), {counts['fail']} "
        f"failed/errored latest rows, {counts['never']} not yet sampled."
    )
    lines.append(_bench_provenance(repo_dir))
    return "\n".join(lines) + "\n"


def _bench_provenance(repo_dir: str | None = None) -> str:
    """Which bench artifact is which (VERDICT r11 Next #2): the driver
    sync overwrites BENCH.json in place, so the builder's closing run
    also writes BENCH_CLOSE.json (BENCH_CLOSE=1), which the sync never
    touches. Cite both here so the audit never has to dig through git
    to recover the builder's number."""
    parts = ["\n## Bench provenance\n"]
    for fname, what in (
        ("BENCH.json", "last bench run on this tree (driver sync "
                       "overwrites it in place each round)"),
        ("BENCH_CLOSE.json", "builder's closing run (BENCH_CLOSE=1; "
                             "never touched by the driver sync)"),
    ):
        path = os.path.join(repo_dir or _REPO, fname)
        if not os.path.exists(path):
            parts.append(f"- `{fname}` — absent — {what}")
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            val = rec.get("value")
            nq = len(rec.get("queries", {}))
            tag = " [builder_close]" if rec.get("builder_close") else ""
            parts.append(
                f"- `{fname}` — {val}s / {nq} queries{tag} — {what}"
            )
            m = rec.get("machine")
            if m:
                # comparability metadata (VERDICT r12 Next #5): lets a
                # cross-round delta be normalized by the machine window
                parts.append(
                    "  - machine window: "
                    f"loadavg_before={m.get('loadavg_before', m.get('loadavg'))}"
                    " (pre-sweep — the quietness reading), "
                    f"loadavg_after={m.get('loadavg_after')} (sweep's own load), "
                    f"cpu_mhz_mean={m.get('cpu_mhz_mean')}, "
                    f"calib_python={m.get('calib_python_sec')}s, "
                    f"calib_spark={m.get('calib_spark_sec')}s"
                )
        except Exception as exc:
            parts.append(f"- `{fname}` — unreadable ({exc!r}) — {what}")
    return "\n".join(parts)


def main() -> None:
    report = build_report()
    target = os.path.join(_REPO, "EVIDENCE.md")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        f.write(report)
    os.replace(tmp, target)
    print(f"wrote {target} ({report.count(chr(10))} lines)", file=sys.stderr)


if __name__ == "__main__":
    main()
