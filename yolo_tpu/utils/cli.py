"""Dash/underscore-agnostic argparse for the CLI surface.

The reference's CLIs mix long-flag spellings — train.py:629 defines
``--a-bit`` while detect.py:202 defines ``--a_bit``, PTQ.py:134 uses
``--gray_scale``, and the README's command lines use ``--img_size``
(README.md:248-290) — so verbatim reference command lines fail on two of
its own four entry scripts. Every long flag registered through FlexParser
accepts both spellings; the first spelling passed stays the canonical one
(dest, help, usage).
"""

from __future__ import annotations

import argparse


class FlexParser(argparse.ArgumentParser):
    def add_argument(self, *args, **kwargs):  # noqa: D102
        opts = []
        for a in args:
            if isinstance(a, str) and a.startswith('--') and len(a) > 3:
                base = a[2:]
                for v in (base, base.replace('_', '-'),
                          base.replace('-', '_')):
                    flag = '--' + v
                    if flag not in opts:
                        opts.append(flag)
            elif a not in opts:
                opts.append(a)
        return super().add_argument(*opts, **kwargs)

    def _get_option_tuples(self, option_string):
        # prefix abbreviations (--img for --img-size) must not become
        # "ambiguous" just because both spellings of ONE action match —
        # collapse matches that resolve to the same action
        tuples = super()._get_option_tuples(option_string)
        seen, out = set(), []
        for t in tuples:
            if id(t[0]) not in seen:
                seen.add(id(t[0]))
                out.append(t)
        return out
