"""CLI entry point (subcommands filled in as subsystems land)."""


def main() -> None:
    raise SystemExit("mmrs CLI: subcommands arrive with the pipeline layers")
