"""log4cxx-style logging configuration parity (reference main.cpp:56-61)."""
import logging

import numpy as np

from siga_tpu.core import logconf
from siga_tpu.index.fm import FMIndex


def test_configure_from_properties(tmp_path):
    p = tmp_path / "log4cxx.properties"
    p.write_text(
        "log4j.rootLogger=warn,STDOUT\n"
        "log4j.logger.OverlapBuilder=debug\n"
        "log4j.appender.STDOUT=org.apache.log4j.ConsoleAppender\n"
        "log4j.appender.STDOUT.layout=org.apache.log4j.PatternLayout\n"
        "log4j.appender.STDOUT.layout.ConversionPattern="
        "%d %5p [%t] (%F:%L) - %m%n\n"
    )
    logconf.configure(str(p))
    assert logging.getLogger("siga").level == logging.WARNING
    assert logging.getLogger("siga.OverlapBuilder").level == logging.DEBUG
    fmt = logging.getLogger("siga").handlers[0].formatter._fmt
    assert "%(message)s" in fmt and "%(levelname)s" in fmt
    logconf.configure()  # reset to defaults for other tests


def test_missing_file_basic_config(tmp_path):
    logconf.configure(str(tmp_path / "absent.properties"))
    root = logging.getLogger("siga")
    assert root.level == logging.INFO and root.handlers


def test_fmindex_info_logs(caplog):
    logconf.configure()
    codes = np.array([0, 1, 1, 2, 3, 4, 0], dtype=np.uint8)
    fmi = FMIndex(codes, 2)
    logging.getLogger("siga").propagate = True
    try:
        with caplog.at_level(logging.INFO, logger="siga.FMIndex"):
            fmi.info()
    finally:
        logging.getLogger("siga").propagate = False
    text = " ".join(r.message for r in caplog.records)
    assert "fm-index info" in text and "7 symbols in 6 runs" in text
