#!/usr/bin/env python3
"""Generate the FIXTURES.md §B reference-shaped fixtures under
src/test/resources/hicsa/ from the golden artifact
/root/reference/data/hi-csa-db.rds (parsed with tools/read_rds.py).

The golden table IS the reference's only correctness artifact
(hi-csa-db.Rmd:593), so the fixtures are reconstructed by inverting the
pipeline's final stages:

 - elements.parquet (B5): an ordered DOM-element table whose faithful
   walk (fill-forward h3/h4 WITHOUT reset — the reference's loop never
   clears current_h4 on a new h3, Rmd:185-192 — then inner link
   explode, Rmd:216-270) re-produces the pre-repair technical table.
   The stop-gap repairs (Rmd:572-585) are inverted: the 10 golden
   "Conservation Efforts"/"Support Pollinators" rows were H4-less
   paragraphs under the junk first h3 (the conference-listing heading
   that also leaks into Policy rows via R's NA-matching `match`), and
   the 5 Energy rows carried a stale h4 ("Forest Stand Improvement",
   inherited because the Energy section has no h4 of its own — the
   "Energy mis-matched info" bug the repair fixes positionally).
 - policy.parquet (B6): sheet rows reconstructed from consecutive
   (Description, Resource) runs; Description split back into
   (GuidingPolicy, Description, Verbiage) at the paste0 seams
   (Rmd:518-521; "NA" parts become real nulls so the R NA→"NA"
   coercion is exercised); CSA Goals re-synthesized from the matched
   practices' lexicon keywords (verified below to reproduce exactly
   the golden match set under the reference's token-substring
   semantics, Rmd:75-88).
 - support.parquet (B7): the golden Support block verbatim plus two
   null-Description rows the Rmd:556 filter must drop.
 - golden.parquet (B1): the golden 308x5 table itself, the expected
   output the GoldenParitySpec compares against.
"""
import json
import subprocess
import sys
import os

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/test/resources/hicsa")
RDS = "/root/reference/data/hi-csa-db.rds"

# The reference's 21-row keyword -> practice lexicon (hi-csa-db.Rmd:497-509)
LEXICON = [
    ("Pollinators", "Support Pollinators"),
    ("Cover", "Conservation Cover"),
    ("Rotation", "Conservation Crop Rotation"),
    ("Crop", "Cover Crop"),
    ("Filter", "Filter Strips"),
    ("Mulching", "Mulching"),
    ("Nutrient", "Nutrient Management"),
    ("Digester", "Anaerobic Digester"),
    ("Critical", "Critical Area Planting"),
    ("Windbreak", "Windbreak and Shelterbelt Establishment and Renovation"),
    ("Silvopasture", "Silvopasture"),
    ("Buffer", "Riparian Forest Buffer"),
    ("Establishment", "Tree and Shrub Establishment"),
    ("Forest", "Forest Stand Improvement"),
    ("Pipeline", "Irrigation Pipeline"),
    ("Microirrigation", "Irrigation System, Microirrigation"),
    ("Sprinkler", "Sprinkler System"),
    ("Pumping", "Pumping Plant"),
    ("Lighting", "Energy Efficient Lighting System"),
    ("Wetland", "Wetland Restoration"),
    ("Irrigation", "Irrigation Water Management"),
]
PRACTICE_TO_KW = {p: k for k, p in LEXICON}

URL_PREFIX = "https://www.nrcs.usda.gov"
ENERGY = "Energy, Combustion, and Electricity Efficiency"
STALE_H4 = "Forest Stand Improvement"


def detect_csa(goals):
    """Replicate detect.csa (Rmd:75-88): punctuation-normalized tokens,
    case-insensitive substring match per keyword."""
    import re
    toks = re.sub(r"[%s ]+" % re.escape(
        "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"), " ", goals).split(" ")
    out = []
    for kw, practice in LEXICON:
        if any(kw.lower() in t.lower() for t in toks):
            out.append(practice)
    return out


def main():
    golden = json.loads(subprocess.check_output(
        [sys.executable, os.path.join(ROOT, "tools/read_rds.py"), RDS]))
    d = golden["data"]
    rows = list(zip(d["Type"], d["Mitigation"], d["Practice"],
                    d["Description"], d["Resource"]))
    assert len(rows) == 308
    tech, pol, supp = rows[:44], rows[44:84], rows[84:]
    assert all(r[0] == "Technical" for r in tech)
    assert all(r[0] == "Policy" for r in pol)
    assert all(r[0] == "Support" for r in supp)

    junk_h3 = next(r[1] for r in pol if r[2] is None)

    # ---- elements.parquet: invert repairs to pre-repair scrape rows ----
    # (mitigation=h3, practice=h4-or-None, desc, resource) in doc order
    pre = []
    energy_seen = 0
    for r in tech:
        _, m, p, desc, res = r
        if m == "Conservation Efforts" and p == "Support Pollinators":
            pre.append((junk_h3, None, desc, res))       # H4-less head rows
        elif m == ENERGY:
            energy_seen += 1
            pre.append((m, STALE_H4, desc, res))          # stale-h4 bug rows
        else:
            pre.append((m, p, desc, res))
    assert energy_seen == 5

    def relativize(url):
        return url[len(URL_PREFIX):] if url.startswith(URL_PREFIX) else url

    # group doc-order rows into elements: h3 changes emit <h3>, h4 changes
    # emit <h4> (the Energy/AdditionalResources sections inherit the stale
    # h4, so NO h4 element is emitted when entering them), consecutive rows
    # with the same (h3, h4, desc) fold into ONE <p> with multiple links
    elements = []  # (tag, text, links)
    cur_h3, cur_h4 = object(), object()
    for m, p, desc, res in pre:
        link = {"text": f"link{len(elements)}", "href": relativize(res)}
        if m != cur_h3:
            elements.append(("h3", m, None))
            cur_h3 = m
            # entering Energy / Additional Resources: stale h4 carries, no
            # h4 element; otherwise the section re-announces its first h4
            if p == STALE_H4 and m != "Agroforestry, Forestry and Wildlife Habitat":
                cur_h4 = p  # stale carry: matches without a new element
            else:
                cur_h4 = object()
        if p is not None and p != cur_h4:
            elements.append(("h4", p, None))
            cur_h4 = p
        if elements and elements[-1][0] == "p" and elements[-1][1] == desc:
            elements[-1][2].append(link)
        else:
            elements.append(("p", desc, [link]))
    # exercise the inner-explode drop (Rmd:228-241) + the stale-h4 origin:
    # a link-less paragraph under a final Wetlands h4 "Drainage Water
    # Management" — the h4 the Additional Resources section then inherits
    wet_i = max(i for i, e in enumerate(elements)
                if e[0] == "h3" and e[1].startswith("Wetlands"))
    add_i = next(i for i, e in enumerate(elements)
                 if i > wet_i and e[0] == "h3")
    elements.insert(add_i, ("p", "Drainage water management overview.", []))
    elements.insert(add_i, ("h4", "Drainage Water Management", None))
    # the Additional Resources rows' h4 is "Drainage Water Management":
    # drop the now-redundant explicit h4 element after the next h3 (it is
    # inherited, not re-announced — the stale-carry bug)
    for i in range(add_i + 2, len(elements)):
        if elements[i][0] == "h4" and elements[i][1] == "Drainage Water Management":
            del elements[i]
            break
    # also a paragraph BEFORE any h3 — the reference walk discards it
    elements.insert(0, ("p", "Page banner text, no section yet.",
                        [{"text": "banner", "href": "/banner"}]))

    link_t = pa.list_(pa.struct([("text", pa.string()), ("href", pa.string())]))
    el_tbl = pa.table({
        "doc_pos": pa.array(range(len(elements)), pa.int64()),
        "tag": pa.array([e[0] for e in elements], pa.string()),
        "text": pa.array([e[1] for e in elements], pa.string()),
        "links": pa.array([e[2] if e[2] is not None else [] for e in elements],
                          link_t),
    })

    # ---- sanity: replay the faithful walk in python ----
    replay = []
    h3, h4 = None, None
    for tag, text, links in elements:
        if tag == "h3":
            h3 = text
        elif tag == "h4":
            h4 = text
        elif tag == "p" and h3 is not None:
            for lk in links or []:
                href = lk["href"]
                if "http" not in href:
                    href = URL_PREFIX + href
                replay.append((h3, h4, text, href))
    assert replay == pre, "element walk does not reproduce pre-repair rows"

    # keep-first practice lookup (pre-repair, Rmd:511) for policy checks
    prac_miti = {}
    for m, p, desc, res in pre:
        if p not in prac_miti:
            prac_miti[p] = m

    # ---- policy.parquet: invert sheet rows ----
    sheet = []  # (gp, desc, verb, goals, url)

    def split_desc(s):
        gp, rest = s.split(": ", 1)
        body, verb = rest.rsplit(" See ", 1)
        assert verb.endswith(".")
        verb = verb[:-1]
        parts = [None if x == "NA" else x for x in (gp, body, verb)]
        def na(x):
            return "NA" if x is None else x
        assert f"{na(parts[0])}: {na(parts[1])} See {na(parts[2])}." == s
        return parts

    i = 0
    while i < len(pol):
        _, m, p, desc, res = pol[i]
        gp, body, verb = split_desc(desc)
        if p is None:
            assert m == junk_h3  # NA practice matched prac.miti's NA row
            sheet.append((gp, body, verb, "no csa goals listed", res))
            i += 1
            continue
        practices = []
        while i < len(pol) and pol[i][3] == desc and pol[i][4] == res \
                and pol[i][2] is not None and pol[i][2] not in practices:
            practices.append(pol[i][2])
            assert prac_miti.get(pol[i][2]) == pol[i][1], \
                (pol[i][2], pol[i][1], prac_miti.get(pol[i][2]))
            i += 1
        goals = " ".join(PRACTICE_TO_KW[q] for q in practices)
        assert detect_csa(goals) == practices, (goals, practices)
        sheet.append((gp, body, verb, goals, res))

    # verify: no no-match goals accidentally matches
    assert detect_csa("no csa goals listed") == []

    pol_tbl = pa.table({
        "GuidingPolicy": pa.array([s[0] for s in sheet], pa.string()),
        "PolicyDescription": pa.array([s[1] for s in sheet], pa.string()),
        "Verbiage": pa.array([s[2] for s in sheet], pa.string()),
        "CsaGoals": pa.array([s[3] for s in sheet], pa.string()),
        "Resource": pa.array([s[4] for s in sheet], pa.string()),
    })

    # ---- support.parquet: golden block + 2 dropped null-Description rows
    srows = [(m, p, desc, res) for _, m, p, desc, res in supp]
    srows.insert(40, ("Soil Health", "Cover Crop", None, "https://x.example/dropped1"))
    srows.append(("Agroforestry, Forestry and Wildlife Habitat", None, None, None))
    sup_tbl = pa.table({
        "Mitigation": pa.array([s[0] for s in srows], pa.string()),
        "Practice": pa.array([s[1] for s in srows], pa.string()),
        "Description": pa.array([s[2] for s in srows], pa.string()),
        "Resource": pa.array([s[3] for s in srows], pa.string()),
    })

    # ---- golden.parquet ----
    gold_tbl = pa.table({
        "Type": pa.array(d["Type"], pa.string()),
        "Mitigation": pa.array(d["Mitigation"], pa.string()),
        "Practice": pa.array(d["Practice"], pa.string()),
        "Description": pa.array(d["Description"], pa.string()),
        "Resource": pa.array(d["Resource"], pa.string()),
    })

    # ---- lexicon.parquet (B8): the single source the Scala copy is
    # spec-checked against (GoldenParitySpec), so the generator's
    # LEXICON and HiCsa.referenceLexicon cannot drift silently
    lex_tbl = pa.table({
        "keyword": pa.array([k for k, _ in LEXICON], pa.string()),
        "practice": pa.array([p for _, p in LEXICON], pa.string()),
    })

    os.makedirs(OUT, exist_ok=True)
    for name, tbl in [("elements", el_tbl), ("policy", pol_tbl),
                      ("support", sup_tbl), ("golden", gold_tbl),
                      ("lexicon", lex_tbl)]:
        path = os.path.join(OUT, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
