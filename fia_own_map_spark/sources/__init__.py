"""Sources & sinks: synthetic web_pages generator, checkpoint store."""
