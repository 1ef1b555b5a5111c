from ircolor_tpu.cli import main

raise SystemExit(main())
