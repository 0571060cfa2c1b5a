"""pdx.pipelines — workload entry points (L6) mirroring the reference scripts."""
