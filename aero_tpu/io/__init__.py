"""Host I/O: output formats, TCP/UDP forwarders, ZMQ wire transport,
SDRReceiver-compatible INI config, IQ/audio file ingest."""
