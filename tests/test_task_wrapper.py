"""Failure-handling contract of the task_wrapper equivalent
(ref src/utils/utils.py:53-105)."""
import pytest

from tunevlseg_tpu.utils.task_wrapper import run_guarded


def test_success_passthrough_and_stale_marker_cleanup(tmp_path):
    (tmp_path / "FAILED").write_text("ValueError\n")  # stale from prior run
    out = run_guarded(lambda: {"ok": 1}, tmp_path)
    assert out == {"ok": 1}
    assert not (tmp_path / "FAILED").exists()


def test_failure_marks_and_reraises(tmp_path):
    def boom():
        raise ValueError("bad hparams")

    with pytest.raises(ValueError, match="bad hparams"):
        run_guarded(boom, tmp_path / "run")
    assert (tmp_path / "run" / "FAILED").read_text().strip() == "ValueError"
    assert "bad hparams" in (tmp_path / "run" / "error.log").read_text()


def test_oom_labeled(tmp_path):
    def oom():
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating")

    with pytest.raises(RuntimeError):
        run_guarded(oom, tmp_path)
    assert (tmp_path / "FAILED").read_text().strip() == "oom"


def test_none_output_dir():
    with pytest.raises(KeyError):
        run_guarded(lambda: {}[1], None)  # no dir -> still re-raises cleanly
