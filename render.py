#!/usr/bin/env python
"""Alias for rendering.py (the reference README documents ``render.py``
while shipping ``rendering.py`` — we provide both; SURVEY.md §7.5)."""

from rendering import main

if __name__ == "__main__":
    main()
