"""CLI and progressive-checkpoint tests."""

import io
import os
import pathlib

import numpy as np
import pytest

from plutracer_tpu.cli import main


def test_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.bmp"
    rc = main([
        "/root/reference/scenes/minimal1.urn",
        "/res", "48x36", "/smp", "2",
        "/o", str(out),
    ])
    assert rc == 0
    assert out.exists()
    from plutracer_tpu.io.bmp import read_bmp

    img = read_bmp(str(out))
    assert img.shape == (36, 48, 3)
    assert img.max() > 0  # something rendered (and the watermark drew)


def test_cli_default_output_name(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["/root/reference/scenes/minimal1.urn", "/res", "32x24", "/smp", "1"])
    assert rc == 0
    outs = list(tmp_path.glob("image_*.bmp"))
    assert len(outs) == 1


def test_repl_pipe(monkeypatch, capsys):
    from plutracer_tpu.urn.repl import run_repl

    # the REPL evaluates exactly one value per line (reference
    # main.cpp:131-141 parses a single urn::value), so function calls need
    # a group
    stdin = io.StringIO("(1 + 2)\n(reduce [ 3 + 4 10 ])\n:!q\n")
    run_repl(stdin=stdin)
    out = capsys.readouterr().out
    assert "3" in out
    assert "[ 7 10 ]" in out


def test_repl_exit_42(monkeypatch):
    from plutracer_tpu.urn.repl import run_repl

    with pytest.raises(SystemExit) as e:
        run_repl(stdin=io.StringIO(":!x\n"), stdout=io.StringIO())
    assert e.value.code == 42


def test_checkpoint_resume(tmp_path):
    import jax

    from plutracer_tpu.render.progressive import render_with_checkpoint
    from plutracer_tpu.render.renderer import render
    from plutracer_tpu.scene import compile_scene, load_scene_file

    d = load_scene_file("/root/reference/scenes/minimal1.urn", ["/res", "32x24"])
    s = compile_scene(d)
    ck = str(tmp_path / "state.npz")
    n = 2
    # run passes 0..1 then "crash"; resume must produce the same image as a
    # straight run (counter-based RNG => exact reproducibility)
    full = render_with_checkpoint(s, 32, 24, n, seed=7)
    partial = render_with_checkpoint(
        s, 32, 24, n, seed=7, checkpoint_path=ck, checkpoint_every=1
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(partial), rtol=1e-6)
    # simulate a resume: rewind the saved state to pass 2 and re-render
    from plutracer_tpu.render.progressive import load_state, save_state

    accum, next_pass, seed = load_state(ck)
    assert next_pass == n * n
    # fake a partial checkpoint at pass 2 by re-rendering 2 passes
    from plutracer_tpu.render.renderer import render_pass
    import jax.numpy as jnp

    key = jax.random.PRNGKey(7)
    acc2 = jnp.zeros((24 * 32, 3))
    for i in range(2):
        acc2 = acc2 + render_pass(s, jax.random.fold_in(key, i), jnp.int32(i), 32, 24, n)
    save_state(ck, acc2, 2, 7)
    resumed = render_with_checkpoint(
        s, 32, 24, n, seed=7, checkpoint_path=ck, checkpoint_every=100
    )
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full), rtol=1e-5)
