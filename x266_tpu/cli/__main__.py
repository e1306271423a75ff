from x266_tpu.cli.main import main

raise SystemExit(main())
