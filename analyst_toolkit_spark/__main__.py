from analyst_toolkit_spark.cli import main

raise SystemExit(main())
