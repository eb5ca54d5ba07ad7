"""`python -m databox_adls_loader_spark` — see cli.py."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
