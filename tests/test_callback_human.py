"""Host-callback human seat inside a jitted device game (SURVEY.md §5)."""

import builtins
import re

import numpy as np
import pytest

from rl6nimmt_tpu.runtime.callback_human import play_callback_game

pytestmark = pytest.mark.heavy  # compile-heavy suite; run via `pytest -m heavy`



def test_callback_game_completes_with_scripted_human(monkeypatch, capsys):
    """The io_callback seat drives a full jitted game; scripted stdin plays
    the first held card every turn (reference prompt semantics incl. the
    1-indexed card faces)."""
    prompts = []

    def scripted_input(prompt=""):
        prompts.append(prompt)
        m = re.search(r"cards:\s*((?:\s*\d+)+)", prompt)
        return m.group(1).split()[0]

    monkeypatch.setattr(builtins, "input", scripted_input)
    scores = play_callback_game(
        ["random", "uniform"], mc_max=8, seed=3, name="Tester"
    )
    assert scores.shape == (3,)
    assert np.all(scores <= 0)
    assert len(prompts) == 10  # one prompt per turn, no re-prompts
    assert all("Tester" in p for p in prompts)
    out = capsys.readouterr().out
    assert out.count("Board:") == 10  # board rendered from obs every turn
    assert "Final scores" in out


def test_callback_game_reprompts_on_bad_card(monkeypatch):
    """Invalid entries re-prompt until a held card is named (human.py:7-33)."""
    state = {"bad": True, "count": 0}

    def scripted_input(prompt=""):
        state["count"] += 1
        if state["bad"]:
            state["bad"] = False
            return "not-a-card"
        m = re.search(r"cards:\s*((?:\s*\d+)+)", prompt)
        if m is None:  # re-prompt line
            m = re.search(r"((?:\s*\d+)+)\s*$", prompt)
        state["bad"] = True  # fail first try of the next turn too
        return m.group(1).split()[0]

    monkeypatch.setattr(builtins, "input", scripted_input)
    scores = play_callback_game(["random"], mc_max=8, seed=5)
    assert scores.shape == (2,)
    assert state["count"] == 20  # 10 turns x (1 bad + 1 good)
