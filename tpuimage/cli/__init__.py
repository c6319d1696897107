"""CLI entry points mirroring the reference's per-script interfaces
(SURVEY.md §1 L4): docscan, morphseq, night, face, landscape, classify.

Run as ``python -m tpuimage.cli.<name> ...``.
"""
