"""Bundled data assets (canonical CV fold indices — see data/folds.py and
tools/import_reference_folds.py). This is a package so packaging tools
discover and ship the .npz payloads declared in pyproject.toml."""
