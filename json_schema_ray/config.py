"""Engine configuration / extension surface.

Mirrors the reference's ``Configuration`` singleton (reference:
lib/json_schema/configuration.rb:3-31): custom format validators,
``all_of_sub_errors`` and ``validate_regex_with``.
"""

from __future__ import annotations

from typing import Callable, Optional


class Configuration:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.validate_regex_with: Optional[str] = None
        self.custom_formats: dict = {}
        self.all_of_sub_errors: bool = False

    def register_format(self, name: str, validator: Callable) -> None:
        self.custom_formats[name] = validator


_configuration = Configuration()


def configuration() -> Configuration:
    return _configuration


def configure(fn: Callable[[Configuration], None]) -> None:
    fn(_configuration)
