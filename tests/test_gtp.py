"""GTP front-end tests (human-play parity, reference human_play.py)."""

import io

import pytest

from transgo_tpu.config import small_test_config
from transgo_tpu.ui.gtp import GTPEngine


@pytest.fixture(scope="module")
def gtp():
    cfg = small_test_config(
        board_size=5, max_step=20, num_simulation=4, parallel_readouts=2,
        num_features=8,
    )
    return GTPEngine(cfg)


def _cmd(gtp, line):
    out, err, quit_ = gtp.handle(line)
    return out


def test_protocol_basics(gtp):
    assert _cmd(gtp, "protocol_version").startswith("= 2")
    assert "transgo" in _cmd(gtp, "name")
    assert "genmove" in _cmd(gtp, "list_commands")
    assert _cmd(gtp, "known_command play").startswith("= true")
    assert _cmd(gtp, "known_command frobnicate").startswith("= false")


def test_id_echo(gtp):
    assert _cmd(gtp, "7 protocol_version").startswith("=7 2")


def test_play_and_show(gtp):
    _cmd(gtp, "clear_board")
    out = _cmd(gtp, "play black C3")
    assert out.startswith("= ")
    board = _cmd(gtp, "showboard")
    assert "X" in board


def test_illegal_play_errors(gtp):
    _cmd(gtp, "clear_board")
    _cmd(gtp, "play black C3")
    out = _cmd(gtp, "play white C3")
    assert out.startswith("?")


def test_vertex_round_trip(gtp):
    for v in ["A1", "E5", "C3", "A5", "E1"]:
        a = gtp.vertex_to_action(v)
        assert gtp.action_to_vertex(a).upper() == v


def test_genmove_returns_vertex(gtp):
    _cmd(gtp, "clear_board")
    out = _cmd(gtp, "genmove black")
    v = out[2:].strip()
    assert v == "pass" or (v[0] in "ABCDE" and v[1] in "12345")


def test_final_score_format(gtp):
    _cmd(gtp, "clear_board")
    out = _cmd(gtp, "final_score")
    assert out[2] in "BW" and "+" in out


def test_undo(gtp):
    _cmd(gtp, "clear_board")
    _cmd(gtp, "play black C3")
    before = _cmd(gtp, "showboard")
    _cmd(gtp, "play white D3")
    _cmd(gtp, "undo")
    assert _cmd(gtp, "showboard") == before
