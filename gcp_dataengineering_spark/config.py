"""Config plumbing — the reference's INI-driven table bindings
(``stage_1_hcp_channel_all_hardcode.py:23-40`` ``read_config_file`` /
``check_config_section``, and the 30+ name bindings at
``stage_1:52-91``), minus the AWS specifics.

An INI section per environment maps logical table names to parquet
paths; `registry_from_config` turns one section into a
TableRegistry. Missing-section handling mirrors the reference's
check (raise with the section name)."""

from __future__ import annotations

import configparser

from .catalog import TableRegistry


def read_config_file(path: str) -> configparser.ConfigParser:
    """``stage_1:23-30`` — parse the INI; raise on unreadable file."""
    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found or unreadable: {path}")
    return cp


def check_config_section(cp: configparser.ConfigParser, section: str) -> None:
    """``stage_1:33-40`` — fail fast when the environment section is
    absent."""
    if not cp.has_section(section):
        raise KeyError(f"config section not found: {section}")


def registry_from_config(cp: configparser.ConfigParser, section: str) -> TableRegistry:
    """Section entries name → path become the table registry (the
    reference interpolates ``db.table`` names into SQL instead;
    here parquet paths resolve directly)."""
    check_config_section(cp, section)
    return TableRegistry(dict(cp.items(section)))
