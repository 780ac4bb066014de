package org.apache.kafka.clients.admin;

import java.util.Collection;

/** Signature-contract stub (see graft.stubs.StubData). */
public class Config {
  private final Collection<ConfigEntry> entries;
  public Config(Collection<ConfigEntry> entries) { this.entries = entries; }
  public Collection<ConfigEntry> entries() { return entries; }
}
