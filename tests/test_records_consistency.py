"""The repo's accuracy story must have ONE answer (VERDICT r4 missing #2 /
ADVICE r4 high: the committed records once disagreed 4.7x across files).

Pins: the two canonical records agree with each other, both carry platform
provenance, and the README table row quotes the canonical ATE.
"""

import json
import re
from pathlib import Path

ROOT = Path(__file__).parent.parent


def _load(p):
    return json.loads((ROOT / p).read_text())


def test_canonical_records_agree_and_are_stamped():
    e2e = _load("eval_real_asset.json")
    rec = _load("model/MACVO_FrontendCov.eval.json")
    for r in (e2e, rec):
        assert r.get("platform"), "record must carry a platform stamp"
        assert r.get("measured_utc"), "record must carry a timestamp"
    assert e2e["writer"] == "scripts/promote_checkpoint.py"
    ate_e2e = e2e["metrics"]["ATE"]["rmse"]
    assert abs(ate_e2e - rec["ate_m"]) < 1e-9, \
        f"eval_real_asset.json ATE {ate_e2e} != eval.json ate_m {rec['ate_m']}"


def test_readme_quotes_the_canonical_ate():
    ate = _load("eval_real_asset.json")["metrics"]["ATE"]["rmse"]
    readme = (ROOT / "README.md").read_text()
    row = next(l for l in readme.splitlines()
               if "shipped r5 ckpt" in l or "shipped r" in l and "Learned frontend" in l)
    m = re.search(r"\*\*([0-9.]+) m\*\*", row)
    assert m, f"no bold ATE in README row: {row}"
    assert abs(float(m.group(1)) - ate) < 5e-4, \
        f"README row ATE {m.group(1)} drifted from canonical {ate:.4f}"
