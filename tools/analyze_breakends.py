"""Root-cause unmatched breakends from a flagship detail dump.

Reads a PF_DUMP detail JSON (demo_pf_cross._maybe_dump — round 5 adds
breakend provenance: partition, mateid, target, novel-kmer support) plus
the deterministic simulation truth, and classifies every breakend call
that is not within 1 kb of a NAHR truth junction:

  - nahr_donor_side: within the DONOR locus of a true NAHR event — the
    simulated NAHR splices a distant same-chromosome donor window
    (simulate.gen_nahr), so a correct caller emits breakends at BOTH the
    event locus and the donor locus; the demo evaluator only credits the
    event side.  Donor origins are recovered by searching the background
    chromosome for 80 bp windows of the truth alt allele.
  - inherited_pair: its mate pairs mom/dad targets at the same locus and
    the partition's calls carry low/absent novel support after FilterCalls
    (the inherited-haplotype FP class expressed as a breakend pair rather
    than a small variant);
  - crossover: within 1 kb of a recombination boundary;
  - low_support: NOVEL_KMERS < 5 (the manuscript FDR rule holds it);
  - filtered: the breakend does not survive FilterCalls in the committed
    filtered VCF (checked when the workdir is given);
  - other: listed for manual review.

Usage: python tools/analyze_breakends.py <detail.json> [workdir]
Env: PF_MBP/PF_CHROMS/PF_DNMS/PF_K to match the run (defaults match).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    detail_path = sys.argv[1]
    workdir = sys.argv[2] if len(sys.argv) > 2 else None
    mbp = float(os.environ.get("PF_MBP", "21"))
    n_chroms = int(os.environ.get("PF_CHROMS", "14"))
    n_dnms = int(os.environ.get("PF_DNMS", "40"))
    k = int(os.environ.get("PF_K", "47"))

    from demo_pf_cross import make_cross
    from corticall_tpu import simulate as sim

    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, mbp, n_chroms, 0.003)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=n_dnms, k=k,
                                     seed=7)
    bounds: dict = {}
    for r in res.get("recombs", []):
        if r.get("start", 0) > 0:
            bounds.setdefault(f"chr{r['chr']}", []).append(r["start"])

    d = json.load(open(detail_path))
    truth = d["truth"]
    calls = d["calls"]
    sym = [c for c in calls if c.get("symbolic")]
    nahr = [t for t in truth if t["info"]["TYPE"] == "NAHR-INS"]

    def near(c, t, tol):
        return (c["chrom"].split(":")[-1] == t["chrom"].split(":")[-1]
                and abs(c["pos"] - t["pos"]) <= tol)

    surviving = None
    if workdir and os.path.exists(os.path.join(workdir, "calls.filtered.vcf")):
        surviving = set()
        with open(os.path.join(workdir, "calls.filtered.vcf")) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                fs = line.split("\t")
                surviving.add((fs[0], int(fs[1])))

    unmatched = [c for c in sym
                 if not any(near(c, t, 1000) for t in nahr)]
    by_partition: dict = {}
    for c in sym:
        by_partition.setdefault(c.get("partition"), []).append(c)

    # donor loci of the true NAHR events (see module docstring)
    parent_seqs = {"mom": mom, "dad": dad}
    donor_spans: dict = {}
    for t in nahr:
        ch = t["chrom"].split(":")[-1]
        back = t["chrom"].split(":")[0] if ":" in t["chrom"] else "mom"
        alt = t["alt"].upper()
        seq = parent_seqs.get(back, mom).get(ch, "")
        for off in range(0, max(0, len(alt) - 80), 40):
            piece = alt[off:off + 80]
            loc = seq.find(piece)
            while loc != -1:
                if abs(loc + 1 - t["pos"]) > 1000:
                    origin = loc - off + 1
                    donor_spans.setdefault(ch, []).append(
                        (origin - 500, origin + len(alt) + 500, t["pos"]))
                loc = seq.find(piece, loc + 1)

    rows, counts = [], {"nahr_donor_side": 0, "crossover": 0,
                        "low_support": 0, "filtered_out": 0,
                        "mom_dad_pair": 0, "other": 0}
    for c in unmatched:
        ch, p = c["chrom"], c["pos"]
        cls = []
        for lo, hi, event_pos in donor_spans.get(ch, ()):
            if lo <= p <= hi:
                cls.append("nahr_donor_side")
                break
        if any(abs(p - b) <= 1000 for b in bounds.get(ch, ())):
            cls.append("crossover")
        try:
            if int(c.get("novel_kmers") or 0) < 5:
                cls.append("low_support")
        except (TypeError, ValueError):
            pass
        if surviving is not None and (ch, p) not in surviving:
            cls.append("filtered_out")
        sibs = by_partition.get(c.get("partition"), [])
        backs = {s.get("background") for s in sibs}
        if {"mom", "dad"} <= backs:
            cls.append("mom_dad_pair")
        for key in ("nahr_donor_side", "crossover", "low_support",
                    "filtered_out", "mom_dad_pair"):
            if key in cls:
                counts[key] += 1
        if not cls:
            counts["other"] += 1
        rows.append({"chrom": ch, "pos": p,
                     "partition": c.get("partition"),
                     "target": c.get("target"),
                     "novel_kmers": c.get("novel_kmers"),
                     "classes": cls or ["other"]})

    print(json.dumps({
        "metric": "unmatched_breakend_rootcause",
        "total_symbolic": len(sym),
        "unmatched": len(unmatched),
        "classes": counts,
        "held_by_filtercalls": (None if surviving is None else
                                sum(1 for r in rows
                                    if "filtered_out" in r["classes"])),
        "rows": rows,
    }, indent=1))


if __name__ == "__main__":
    main()
