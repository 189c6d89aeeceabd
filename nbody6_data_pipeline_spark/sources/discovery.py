"""S9 — simulation-run directory discovery (reference utils.py:51-83).

Walks a root for run directories matching
``Rad(\\d{2})/zmet(\\d{4})/M(\\d)/(\\d{4})`` and yields (attrs, path,
label) sorted by mass level. Driver-side (directory listing), the
label format shared with F24.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

RUN_REGEX = re.compile(
    r"Rad(?P<init_gc_radius>\d{2})[/\\]zmet(?P<init_metallicity>\d{4})"
    r"[/\\]M(?P<init_mass_lv>\d)[/\\](?P<init_pos>\d{4})$"
)


@dataclass(frozen=True)
class RunInfo:
    init_gc_radius: int
    init_metallicity: int
    init_mass_lv: int
    init_pos: int
    path: str

    @property
    def label(self) -> str:
        return (
            f"Rad{self.init_gc_radius:02d}-zmet{self.init_metallicity:04d}"
            f"-M{self.init_mass_lv}-{self.init_pos:04d}"
        )

    @property
    def attrs(self) -> dict:
        return {
            "init_gc_radius": self.init_gc_radius,
            "init_metallicity": self.init_metallicity,
            "init_mass_lv": self.init_mass_lv,
            "init_pos": self.init_pos,
        }


def fetch_sim_runs(base: str, is_reverse: bool = False) -> list[RunInfo]:
    """Discover runs under ``base``; sorted by init_mass_lv (the
    reference's memory-aware scheduling key), then label."""
    runs: list[RunInfo] = []
    for dirpath, _dirnames, _files in os.walk(base):
        m = RUN_REGEX.search(dirpath)
        if m:
            runs.append(
                RunInfo(
                    init_gc_radius=int(m.group("init_gc_radius")),
                    init_metallicity=int(m.group("init_metallicity")),
                    init_mass_lv=int(m.group("init_mass_lv")),
                    init_pos=int(m.group("init_pos")),
                    path=dirpath,
                )
            )
    runs.sort(
        key=lambda r: (r.init_mass_lv, r.label), reverse=is_reverse
    )
    return runs
