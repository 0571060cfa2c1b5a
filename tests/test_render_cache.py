"""Unit tests for pdx.report.render_cache (pure host — no jax).

The memo must (1) render on first sight, (2) skip the render and copy the
prior files for identical inputs to a different directory, (3) no-op on a
same-path hit, (4) re-render when the recorded sources were deleted, and
(5) miss when any key part changes.
"""

from __future__ import annotations

import numpy as np

from pdx.report.render_cache import cached_render, clear_render_memo


def _renderer(paths, payload: bytes):
    calls = {"n": 0}

    def render() -> None:
        calls["n"] += 1
        for p in paths:
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(payload)

    return render, calls


def test_miss_then_same_path_hit(tmp_path):
    clear_render_memo()
    out = [tmp_path / "a.png", tmp_path / "b.png"]
    render, calls = _renderer(out, b"pixels")
    key = [np.arange(8), "tag-state"]
    cached_render("t", key, out, render)
    cached_render("t", key, out, render)
    assert calls["n"] == 1
    assert out[0].read_bytes() == b"pixels"


def test_cross_dir_hit_copies_files(tmp_path):
    clear_render_memo()
    src = [tmp_path / "one" / "a.png"]
    render, calls = _renderer(src, b"content")
    cached_render("t", [b"k"], src, render)
    dst = [tmp_path / "two" / "a.png"]
    render2, calls2 = _renderer(dst, b"SHOULD NOT RUN")
    cached_render("t", [b"k"], dst, render2)
    assert calls2["n"] == 0
    assert dst[0].read_bytes() == b"content"


def test_deleted_source_re_renders(tmp_path):
    clear_render_memo()
    src = [tmp_path / "a.png"]
    render, calls = _renderer(src, b"v1")
    cached_render("t", [b"k"], src, render)
    src[0].unlink()
    cached_render("t", [b"k"], src, render)
    assert calls["n"] == 2
    assert src[0].read_bytes() == b"v1"


def test_key_change_is_a_miss(tmp_path):
    clear_render_memo()
    out = [tmp_path / "a.png"]
    render, calls = _renderer(out, b"x")
    cached_render("t", [np.zeros(4)], out, render)
    cached_render("t", [np.ones(4)], out, render)
    assert calls["n"] == 2


def test_distinct_tags_do_not_collide(tmp_path):
    clear_render_memo()
    a = [tmp_path / "a.png"]
    b = [tmp_path / "b.png"]
    ra, ca = _renderer(a, b"A")
    rb, cb = _renderer(b, b"B")
    cached_render("tag-a", [b"k"], a, ra)
    cached_render("tag-b", [b"k"], b, rb)
    assert ca["n"] == 1 and cb["n"] == 1
    assert a[0].read_bytes() == b"A" and b[0].read_bytes() == b"B"
