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


def test_genmove_out_of_turn_plays_requested_color(gtp):
    """genmove for the off-turn color injects a pass (GTP allows it)."""
    import numpy as np
    _cmd(gtp, "clear_board")
    _cmd(gtp, "genmove white")     # black to move -> pass for black first
    _cmd(gtp, "genmove white")
    stones = np.asarray(gtp.state.stones[0])
    assert (stones == 1).sum() == 0      # no black stones ever placed
    assert (stones == 2).sum() <= 2      # whites (could pass)


class TestBoardGUI:
    """Display-free logic behind the tkinter board (ui/board_gui.py)."""

    def test_snap_to_point(self):
        from transgo_tpu.ui.board_gui import snap_to_point

        # exact intersection (row 1, col 2) at origin 40, cell 46
        assert snap_to_point(40 + 2 * 46, 40 + 46, 40, 46, 9) == 9 + 2
        # within tolerance
        assert snap_to_point(40 + 2 * 46 + 8, 40 + 46 - 8, 40, 46, 9) == 11
        # centered between intersections -> rejected
        assert snap_to_point(40 + 23, 40 + 23, 40, 46, 9) == -1
        # off-board
        assert snap_to_point(0, 0, 40, 46, 9) == -1
        assert snap_to_point(40 + 12 * 46, 40, 40, 46, 9) == -1

    def test_board_delta(self):
        import numpy as np

        from transgo_tpu.ui.board_gui import board_delta

        old = np.array([0, 1, 2, 0], np.int8)
        new = np.array([1, 1, 0, 0], np.int8)
        added, removed = board_delta(old, new)
        assert added == [(0, 1)] and removed == [2]

    def test_session_human_vs_human(self):
        from transgo_tpu.config import small_test_config
        from transgo_tpu.ui.board_gui import GameSession

        s = GameSession(small_test_config(board_size=5, max_step=20,
                                          num_features=8), bot=False)
        assert s.play(12)                   # center
        assert s.stones[12] == 1
        assert not s.play(12)               # occupied -> rejected
        assert s.to_play == 2
        assert s.undo()
        assert s.stones[12] == 0 and s.to_play == 1
        s.play(12)
        s.resign()                          # white resigns
        assert s.game_over and s.result() == "B+Resign"
        s.new_game()
        assert not s.game_over and s.stones.sum() == 0

    def test_session_bot_answers(self):
        from transgo_tpu.config import small_test_config
        from transgo_tpu.ui.board_gui import GameSession

        s = GameSession(small_test_config(
            board_size=5, max_step=20, num_simulation=4,
            parallel_readouts=2, num_features=8))
        assert s.play(6)
        a = s.bot_move()
        assert 0 <= a <= s.pass_action
        assert s.to_play == 1               # back to the human
        # double passes end the game; result is a score string
        s.play(s.pass_action)
        if not s.game_over:
            s.state, _ = s.engine.step(
                s.state, __import__("jax.numpy", fromlist=["a"]).array(
                    [s.pass_action]))
        assert s.result()[0] in "BW"


def test_komi_command_retraces_search():
    """A ``komi`` GTP command must reach the jitted search closure — the
    eval fn bakes komi in at trace time (round-1 staleness bug)."""
    cfg = small_test_config(
        board_size=5, max_step=20, num_simulation=4, parallel_readouts=2,
        num_features=8, komi=2.5, value_own_blend=0.1,
    )
    eng = GTPEngine(cfg)
    select_before = eng._select
    assert _cmd(eng, "komi 7.5").startswith("=")
    assert eng.engine.komi == 7.5
    assert eng._select is not select_before, (
        "komi change did not invalidate the jitted search closure"
    )
    # final_score reflects the new komi immediately (empty board: W+komi)
    assert _cmd(eng, "final_score").strip() == "= W+7.5"
    # no-op komi keeps the compiled closure
    select_now = eng._select
    _cmd(eng, "komi 7.5")
    assert eng._select is select_now


def _engine():
    cfg = small_test_config(
        board_size=5, max_step=20, num_simulation=4, parallel_readouts=2,
        num_features=8,
    )
    return GTPEngine(cfg)


class TestSGF:
    def test_roundtrip_encode_parse(self):
        from transgo_tpu.ops.state import BLACK, WHITE
        from transgo_tpu.ui.sgf import moves_to_sgf, parse_sgf

        moves = [(BLACK, 40), (WHITE, 41), (BLACK, 81), (WHITE, 0)]
        text = moves_to_sgf(9, 7.5, moves, result="B+3.5")
        size, komi, parsed = parse_sgf(text)
        assert size == 9 and komi == 7.5
        assert parsed == moves
        assert "RE[B+3.5]" in text

    def test_parse_skips_variations(self):
        from transgo_tpu.ops.state import BLACK, WHITE
        from transgo_tpu.ui.sgf import parse_sgf

        text = "(;FF[4]SZ[9]KM[5.5];B[aa](;W[bb];B[cc])(;W[dd]))"
        size, komi, moves = parse_sgf(text)
        assert size == 9 and komi == 5.5
        assert moves == [(BLACK, 0)]

    def test_gtp_printsgf_and_loadsgf(self, tmp_path):
        eng = _engine()
        for cmd in ("play black E5", "play white D4", "play black pass"):
            out, err, _ = eng.handle(cmd)
            assert not err, out
        out, err, _ = eng.handle("printsgf")
        assert not err
        sgf = out[1:].strip()
        assert sgf.startswith("(;FF[4]") and ";B[" in sgf and ";W[" in sgf

        p = tmp_path / "game.sgf"
        p.write_text(sgf)
        before = eng.cmd_showboard()
        eng2 = _engine()
        out, err, _ = eng2.handle(f"loadsgf {p}")
        assert not err, out
        assert eng2.cmd_showboard() == before
        # partial load: only the first move
        out, err, _ = eng2.handle(f"loadsgf {p} 1")
        assert not err
        assert eng2.cmd_showboard().count("X") >= 1

    def test_undo_keeps_record_in_sync(self):
        eng = _engine()
        eng.handle("play black E5")
        # out-of-turn second black move injects a white pass in one group
        eng.handle("play black D4")
        assert [m for g in eng.move_groups for m in g][-2][1] == \
            eng.engine.spec.num_points  # injected pass recorded
        eng.handle("undo")
        moves = [m for g in eng.move_groups for m in g]
        assert len(moves) == 1  # the whole group (pass + move) undone
