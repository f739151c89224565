"""Progress reporting (utils/progress.py) — the stdlib replacement for the
reference's vendored ``progress`` package + ``misc.progress_bar``."""

import io

from lidarcrafter_tpu.utils.progress import Bar, format_eta, progress_bar


class _TTY(io.StringIO):
    def isatty(self):
        return True


def test_format_eta_units():
    assert format_eta(4) == "4s"
    assert format_eta(200) == "3m20s"
    assert format_eta(3720) == "1h02m"
    assert format_eta(2 * 86400 + 3 * 3600) == "2d03h"
    assert format_eta(-5) == "0s"


def test_bar_tty_redraws_and_completes():
    out = _TTY()
    bar = Bar(4, desc="work", stream=out, min_interval=0.0)
    for _ in range(4):
        bar.update()
    bar.close()
    text = out.getvalue()
    # in-place redraws end with \r; close emits the final \n line
    assert text.count("\r") == 4
    assert text.endswith("\n")
    assert "work" in text and "4/4" in text and "100%" in text
    assert "eta" in text


def test_bar_nontty_one_line_per_decile():
    out = io.StringIO()  # isatty() -> False
    bar = Bar(100, stream=out)
    for _ in range(100):
        bar.update()
    bar.close()
    lines = [l for l in out.getvalue().splitlines() if l]
    # one line per decile crossed (10%..100%), no \r control chars
    assert 9 <= len(lines) <= 12
    assert "\r" not in out.getvalue()
    assert "100/100" in lines[-1]


def test_bar_wrap_yields_everything():
    out = io.StringIO()
    items = list(Bar.wrap(range(7), desc="it", stream=out))
    assert items == list(range(7))
    assert "7/7" in out.getvalue()


def test_bar_suffix_and_unknown_total():
    out = _TTY()
    bar = Bar(0, desc="n?", stream=out, min_interval=0.0)
    bar.set_suffix("loss 0.12")
    bar.update(3)
    bar.close()
    text = out.getvalue()
    assert "loss 0.12" in text and "n? 3" in text


def test_bar_unknown_total_nontty_is_throttled():
    out = io.StringIO()  # non-TTY, total unknown
    bar = Bar(0, desc="gen", stream=out)
    for _ in range(50):
        bar.update()
    bar.close()
    lines = [l for l in out.getvalue().splitlines() if l]
    # time-throttled: first line + the close line, never one per item
    assert len(lines) <= 2
    assert "gen 50" in lines[-1]


def test_progress_bar_functional_form():
    out = io.StringIO()
    for epoch in range(2):  # second epoch must restart cleanly at current==0
        for i in range(5):
            progress_bar(i, 5, msg=f"e{epoch}", stream=out)
    text = out.getvalue()
    assert "5/5" in text and "e0" in text and "e1" in text
