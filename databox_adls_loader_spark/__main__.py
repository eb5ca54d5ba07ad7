"""`python -m databox_adls_loader_spark` — see cli.py."""

from .cli import main

raise SystemExit(main())
