"""pdx.report — figure/slide generators consuming the artifact contract (L8)."""
