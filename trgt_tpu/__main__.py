from .cli import exit_cli, main

exit_cli(main())
