"""Human-play front-end (reference: tkinter GUI, human_play.py)."""

from transgo_tpu.ui.gtp import GTPEngine  # noqa: F401
