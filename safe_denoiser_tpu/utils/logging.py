"""Run logger: stdout mirror + file handler.

Reference parity: main_utils.py:24-36. Log lines like
"Repellency applied at timestep t" are load-bearing for the log parser
(reference mics/parse_score.py), so runners must keep emitting them.
"""

from __future__ import annotations

import logging


class Logger:
    def __init__(self, filename: str):
        # A per-file logger (not the module logger) so parallel runs don't
        # cross-write each other's logs.txt.
        self.logger = logging.getLogger(f"safe_denoiser_tpu.{filename}")
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False
        if not self.logger.handlers:
            formatter = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
            file_handler = logging.FileHandler(filename)
            file_handler.setLevel(logging.DEBUG)
            file_handler.setFormatter(formatter)
            self.logger.addHandler(file_handler)

    def log(self, text: str) -> None:
        print(text)
        self.logger.info(text)
