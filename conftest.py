# Root conftest: makes the repo root importable in pytest without install.
