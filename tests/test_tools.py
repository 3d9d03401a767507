"""Tests for the local gate tooling (tools/check_oracles.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from check_oracles import self_val_failures  # noqa: E402


class TestSelfValidationGate:
    def test_all_true_passes(self):
        flags, bad = self_val_failures(
            ["q", "est", "within_bound"],
            [(0.5, 1.0, True), (0.9, 2.0, True)])
        assert flags == ["within_bound"] and bad == 0

    def test_false_flag_fails(self):
        # a deliberately broken eps (VERDICT r3 #2): any false cell in a
        # self-validation column must make the gate fail
        flags, bad = self_val_failures(
            ["q", "est", "within_bound"],
            [(0.5, 1.0, True), (0.9, 2.0, False)])
        assert bad == 1

    def test_null_flag_fails(self):
        _, bad = self_val_failures(["planted_all_found"], [(None,)])
        assert bad == 1

    def test_multiple_flag_columns(self):
        flags, bad = self_val_failures(
            ["found_planted", "x", "planted_all_found"],
            [(True, 1, False), (False, 2, True)])
        assert set(flags) == {"found_planted", "planted_all_found"}
        assert bad == 2

    def test_no_flags_no_gate(self):
        flags, bad = self_val_failures(["a", "b"], [(1, 2)])
        assert flags == [] and bad == 0
