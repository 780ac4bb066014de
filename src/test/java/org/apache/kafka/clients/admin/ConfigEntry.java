package org.apache.kafka.clients.admin;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ConfigEntry {
  private final String name;
  private final String value;
  public ConfigEntry(String name, String value) {
    this.name = name;
    this.value = value;
  }
  public String name() { return name; }
  public String value() { return value; }
}
