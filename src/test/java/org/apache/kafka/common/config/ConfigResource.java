package org.apache.kafka.common.config;

/** Signature-contract stub (see graft.stubs.StubData). */
public final class ConfigResource {
  public enum Type { BROKER, TOPIC, GROUP, UNKNOWN }
  private final Type type;
  private final String name;
  public ConfigResource(Type type, String name) {
    this.type = type;
    this.name = name;
  }
  public Type type() { return type; }
  public String name() { return name; }
  @Override public boolean equals(Object o) {
    if (!(o instanceof ConfigResource)) return false;
    ConfigResource c = (ConfigResource) o;
    return type == c.type && name.equals(c.name);
  }
  @Override public int hashCode() { return type.hashCode() * 31 + name.hashCode(); }
}
