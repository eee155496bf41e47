#!/usr/bin/env python3
"""Generate synthetic NVD-1.1-shaped year-feed zips for ingest stress tests.

Usage: python3 scripts/gen_nvd.py <outdir> <years> <items_per_year>
Deterministic (seeded); stdlib only. NOT test fixtures — scratch data for
benchmarking the distributed ingest path.
"""
import json, os, random, sys, zipfile

def item(rng, year, i):
    cve = f"CVE-{year}-{i:06d}"
    has_v3 = rng.random() < 0.8
    has_v2 = rng.random() < 0.85
    impact = {}
    if has_v3:
        impact["baseMetricV3"] = {
            "cvssV3": {"attackComplexity": rng.choice(["LOW", "HIGH"]),
                       "attackVector": rng.choice(["NETWORK", "LOCAL", "PHYSICAL"]),
                       "availabilityImpact": "HIGH", "confidentialityImpact": "HIGH",
                       "integrityImpact": "NONE", "privilegesRequired": "NONE",
                       "scope": "UNCHANGED", "userInteraction": "NONE",
                       "vectorString": "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:N/A:H",
                       "baseScore": round(rng.uniform(1, 10), 1), "baseSeverity": "HIGH"},
            "exploitabilityScore": round(rng.uniform(0, 4), 1),
            "impactScore": round(rng.uniform(0, 6), 1)}
    if has_v2:
        bm2 = {"cvssV2": {"accessComplexity": "LOW", "accessVector": "NETWORK",
                          "authentication": "NONE", "availabilityImpact": "PARTIAL",
                          "confidentialityImpact": "PARTIAL", "integrityImpact": "PARTIAL",
                          "vectorString": "AV:N/AC:L/Au:N/C:P/I:P/A:P",
                          "baseScore": round(rng.uniform(1, 10), 1)},
               "severity": "MEDIUM",
               "exploitabilityScore": round(rng.uniform(0, 10), 1),
               "impactScore": round(rng.uniform(0, 10), 1),
               "obtainAllPrivilege": False, "obtainOtherPrivilege": False,
               "obtainUserPrivilege": rng.random() < 0.1}
        if rng.random() < 0.9:
            bm2["userInteractionRequired"] = rng.random() < 0.3
        impact["baseMetricV2"] = bm2
    n_nodes = rng.randint(0, 3)
    nodes = []
    for n in range(n_nodes):
        matches = [{"cpe23Uri": f"cpe:2.3:a:vendor{rng.randint(0, 500)}:prod{rng.randint(0, 2000)}:{rng.randint(0, 9)}.{rng.randint(0, 9)}:*:*:*:*:*:*:*",
                    "vulnerable": rng.random() < 0.8} for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.3:
            nodes.append({"children": [{"cpe_match": matches}]})
        else:
            nodes.append({"cpe_match": matches})
    problems = [{"value": f"CWE-{rng.choice([20, 79, 89, 119, 200, 787])}"}
                for _ in range(rng.randint(1, 3))]
    words = " ".join(rng.choice(["buffer", "overflow", "remote", "attacker", "crafted",
                                 "input", "parser", "memory", "corruption", "disclosure"])
                     for _ in range(rng.randint(10, 40)))
    return {
        "cve": {"CVE_data_meta": {"ID": cve},
                "problemtype": {"problemtype_data": [{"description": problems}]},
                "description": {"description_data": [{"value": words}]}},
        "configurations": {"nodes": nodes},
        "impact": impact,
        "publishedDate": f"{year}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}T10:00Z",
        "lastModifiedDate": f"{year}-12-30T10:00Z"}

def main():
    outdir, years, per_year = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(42)
    for y in range(2020, 2020 + years):
        feed = {"CVE_data_type": "CVE", "CVE_data_format": "MITRE",
                "CVE_data_version": "4.0", "CVE_data_numberOfCVEs": str(per_year),
                "CVE_data_timestamp": f"{y}-12-31T08:00Z",
                "CVE_Items": [item(rng, y, i) for i in range(per_year)]}
        name = f"nvdcve-1.1-{y}.json"
        with zipfile.ZipFile(f"{outdir}/{name}.zip", "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr(name, json.dumps(feed))
        print(f"wrote {outdir}/{name}.zip")

if __name__ == "__main__":
    main()
