"""LichessClient tests with patched HTTP (no network) — mirrors reference
test_lichess_client.py coverage: turn parity, last move, connect success/
failure, move accepted/rejected/no-game, plus NDJSON stream parsing and the
reconnect wrapper."""

import json
from unittest import mock

from chessboard_vision_tpu.net.lichess_client import LichessClient


def make_client():
    c = LichessClient(token="test-token")
    return c


class TestTurnParity:
    def test_white_turn(self):
        c = make_client()
        c.my_color = "white"
        assert c.is_my_turn("")
        assert not c.is_my_turn("e2e4")
        assert c.is_my_turn("e2e4 e7e5")

    def test_black_turn(self):
        c = make_client()
        c.my_color = "black"
        assert not c.is_my_turn("")
        assert c.is_my_turn("e2e4")

    def test_no_color(self):
        c = make_client()
        assert not c.is_my_turn("e2e4")

    def test_last_move(self):
        c = make_client()
        assert c.get_last_move("e2e4 e7e5") == "e7e5"
        assert c.get_last_move("") is None


class TestConnect:
    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_connect_success(self, get):
        resp = mock.MagicMock(status_code=200)
        resp.json.return_value = {"username": "tester"}
        get.return_value = resp
        c = make_client()
        assert c.connect()
        assert c.username == "tester"

    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_connect_401(self, get):
        get.return_value = mock.MagicMock(status_code=401)
        c = make_client()
        assert not c.connect()

    def test_connect_without_token(self):
        c = LichessClient(token="")
        assert not c.connect()


class TestMoves:
    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.post")
    def test_move_accepted(self, post):
        post.return_value = mock.MagicMock(status_code=200)
        c = make_client()
        c.current_game_id = "abc"
        assert c.make_move("e2e4")
        assert "abc" in post.call_args[0][0] and "e2e4" in post.call_args[0][0]

    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.post")
    def test_move_rejected(self, post):
        post.return_value = mock.MagicMock(status_code=400, text="invalid")
        c = make_client()
        c.current_game_id = "abc"
        assert not c.make_move("e2e5")

    def test_move_without_game(self):
        c = make_client()
        assert not c.make_move("e2e4")


class TestStream:
    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_stream_parses_ndjson_and_sets_color(self, get):
        events = [
            {"type": "gameFull", "white": {"id": "tester"}, "black": {"id": "opp"},
             "state": {"moves": ""}},
            {"type": "gameState", "moves": "e2e4", "status": "started"},
        ]
        resp = mock.MagicMock(status_code=200)
        resp.iter_lines.return_value = [json.dumps(e).encode() for e in events] + [b""]
        get.return_value = resp
        c = make_client()
        c.username = "tester"
        got = list(c.stream_game("gid"))
        assert [e["type"] for e in got] == ["gameFull", "gameState"]
        assert c.my_color == "white"

    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_stream_error_status_ends(self, get):
        get.return_value = mock.MagicMock(status_code=404)
        c = make_client()
        assert list(c.stream_game("gid")) == []

    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_stream_skips_bad_json(self, get):
        resp = mock.MagicMock(status_code=200)
        resp.iter_lines.return_value = [b"not-json", json.dumps({"type": "gameState"}).encode()]
        get.return_value = resp
        c = make_client()
        got = list(c.stream_game("gid"))
        assert len(got) == 1

    @mock.patch("chessboard_vision_tpu.net.lichess_client.time.sleep")
    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.get")
    def test_reconnect_wrapper_stops_on_stop_check(self, get, _sleep):
        resp = mock.MagicMock(status_code=200)
        resp.iter_lines.return_value = [json.dumps({"type": "gameState"}).encode()]
        get.return_value = resp
        c = make_client()
        stop = {"flag": False}

        def stop_check():
            stop["flag"] = True
            return stop["flag"]

        got = list(c.stream_game_with_reconnect("gid", stop_check=stop_check))
        assert len(got) == 1


class TestSeek:
    @mock.patch("chessboard_vision_tpu.net.lichess_client.requests.post")
    def test_seek_returns_game_id(self, post):
        resp = mock.MagicMock()
        resp.iter_lines.return_value = [json.dumps({"id": "g123"}).encode()]
        post.return_value = resp
        c = make_client()
        assert c.seek_game() == "g123"
