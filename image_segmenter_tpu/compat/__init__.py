"""Reference-compatible public API (numpy uint8 in / numpy uint8 out).

Each module here re-exports the EXACT function signatures of the reference's
`app/processing/*` modules (SURVEY.md §1 "Processing layer public interface")
so the PySide6 UI and test harness run unchanged, while all heavy compute
dispatches to the jitted TPU cores in ops/ and solvers/.

The top-level `processing` package at the repo root aliases these modules,
matching the reference's flat import style (`from processing.x import ...`).
"""
