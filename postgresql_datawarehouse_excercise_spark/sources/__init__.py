"""Data sources.

`bookorders` loads the reference's embedded operational seed (parsed from the
read-only dump at runtime — we deliberately do not vendor the data) so the
golden-output parity suite can replay the reference's full pipeline on the
exact rows it was graded with.
"""
