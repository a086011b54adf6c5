"""Lichess Board API client (HTTP + NDJSON streaming).

Behavioral equivalent of reference lichess_client.py: bearer-token auth
from .env, account check, ongoing-games list, NDJSON game-event stream
(long poll), move/resign POSTs, seek, turn parity from the move list.
Adds an optional reconnect loop around the stream (the reference's
generator simply ends on HTTP errors — SURVEY.md §2 elasticity note).
"""

from __future__ import annotations

import json
import time
from typing import Generator, Optional

import requests

from chessboard_vision_tpu.utils.config import get_lichess_token
from chessboard_vision_tpu.utils.logging import get_logger


class LichessClient:
    BASE_URL = "https://lichess.org"

    def __init__(self, token: Optional[str] = None, env_path: str = ".env"):
        self.token = token if token is not None else get_lichess_token(env_path)
        self.username: Optional[str] = None
        self.current_game_id: Optional[str] = None
        self.my_color: Optional[str] = None
        self._headers = {}
        self.log = get_logger("lichess")

    def connect(self) -> bool:
        """Validate the token via GET /api/account."""
        if not self.token:
            self.log.warning("LICHESS_TOKEN not found in .env")
            return False
        self._headers = {
            "Authorization": f"Bearer {self.token}",
            "Accept": "application/json",
        }
        try:
            resp = requests.get(
                f"{self.BASE_URL}/api/account", headers=self._headers, timeout=10
            )
            if resp.status_code == 200:
                self.username = resp.json().get("username")
                self.log.info("connected as %s", self.username)
                return True
            self.log.warning("account check failed: %s", resp.status_code)
            return False
        except requests.RequestException as e:
            self.log.warning("connection failed: %s", e)
            return False

    def get_ongoing_games(self) -> list:
        try:
            resp = requests.get(
                f"{self.BASE_URL}/api/account/playing", headers=self._headers, timeout=10
            )
            if resp.status_code == 200:
                return resp.json().get("nowPlaying", [])
            return []
        except requests.RequestException as e:
            self.log.warning("get_ongoing_games failed: %s", e)
            return []

    def stream_game(self, game_id: str) -> Generator[dict, None, None]:
        """Yield NDJSON events from the long-lived game stream.

        Sets my_color when the gameFull event arrives. Returns (ends the
        generator) on stream errors, like the reference.
        """
        self.current_game_id = game_id
        headers = {
            "Authorization": f"Bearer {self.token}",
            "Accept": "application/x-ndjson",
        }
        try:
            # (connect, read) timeout: lichess keep-alives arrive every few
            # seconds, so a 60 s read gap means the connection silently died
            # — raise and end the generator instead of blocking iter_lines()
            # forever (the reconnect wrapper then re-establishes the stream).
            resp = requests.get(
                f"{self.BASE_URL}/api/board/game/stream/{game_id}",
                headers=headers,
                stream=True,
                timeout=(10, 60),
            )
            if resp.status_code != 200:
                self.log.warning("stream error: %s", resp.status_code)
                return
            for line in resp.iter_lines():
                if not line:
                    continue
                try:
                    event = json.loads(line.decode("utf-8"))
                except json.JSONDecodeError:
                    continue
                if event.get("type") == "gameFull":
                    self._set_my_color(event)
                yield event
        except requests.RequestException as e:
            self.log.warning("stream error: %s", e)

    def stream_game_with_reconnect(
        self, game_id: str, stop_check=None, max_retries: int = 5, backoff: float = 2.0
    ) -> Generator[dict, None, None]:
        """stream_game wrapped in a bounded reconnect loop."""
        retries = 0
        while retries <= max_retries:
            got_event = False
            for event in self.stream_game(game_id):
                got_event = True
                retries = 0
                yield event
                if stop_check and stop_check():
                    return
            if stop_check and stop_check():
                return
            retries += 1
            if retries > max_retries:
                return
            self.log.info("stream ended; reconnect %d/%d", retries, max_retries)
            time.sleep(backoff * retries)
            if not got_event and retries >= max_retries:
                return

    def _set_my_color(self, event: dict):
        my_id = (self.username or "").lower()
        if event.get("white", {}).get("id", "").lower() == my_id:
            self.my_color = "white"
        elif event.get("black", {}).get("id", "").lower() == my_id:
            self.my_color = "black"
        self.log.info("playing as %s", self.my_color)

    def make_move(self, uci_move: str) -> bool:
        if not self.current_game_id:
            self.log.warning("no active game")
            return False
        try:
            resp = requests.post(
                f"{self.BASE_URL}/api/board/game/{self.current_game_id}/move/{uci_move}",
                headers=self._headers,
                timeout=10,
            )
            if resp.status_code == 200:
                self.log.info("move sent: %s", uci_move)
                return True
            self.log.warning("move rejected: %s %s", resp.status_code, resp.text)
            return False
        except requests.RequestException as e:
            self.log.warning("move error: %s", e)
            return False

    def resign(self) -> bool:
        if not self.current_game_id:
            return False
        try:
            resp = requests.post(
                f"{self.BASE_URL}/api/board/game/{self.current_game_id}/resign",
                headers=self._headers,
                timeout=10,
            )
            return resp.status_code == 200
        except requests.RequestException:
            return False

    def is_my_turn(self, moves_str: str) -> bool:
        if not self.my_color:
            return False
        count = len(moves_str.split()) if moves_str else 0
        return count % 2 == (0 if self.my_color == "white" else 1)

    def get_last_move(self, moves_str: str) -> Optional[str]:
        moves = moves_str.split() if moves_str else []
        return moves[-1] if moves else None

    def seek_game(self, time_minutes: int = 10, increment: int = 0, rated: bool = False):
        try:
            resp = requests.post(
                f"{self.BASE_URL}/api/board/seek",
                headers={**self._headers, "Accept": "application/x-ndjson"},
                data={"time": time_minutes, "increment": increment, "rated": rated},
                stream=True,
                timeout=30,
            )
            for line in resp.iter_lines():
                if line:
                    event = json.loads(line.decode("utf-8"))
                    if "id" in event:
                        return event["id"]
            return None
        except (requests.RequestException, json.JSONDecodeError) as e:
            self.log.warning("seek error: %s", e)
            return None
