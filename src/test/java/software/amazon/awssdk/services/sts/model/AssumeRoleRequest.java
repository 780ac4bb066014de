package software.amazon.awssdk.services.sts.model;

/** Signature-contract stub for the engine's reflective STS binding. */
public class AssumeRoleRequest {
  public final String roleArn;
  public final String roleSessionName;
  private AssumeRoleRequest(Builder b) {
    this.roleArn = b.roleArn;
    this.roleSessionName = b.roleSessionName;
  }
  public static Builder builder() { return new Builder(); }
  public static class Builder {
    private String roleArn;
    private String roleSessionName;
    public Builder roleArn(String v) { this.roleArn = v; return this; }
    public Builder roleSessionName(String v) { this.roleSessionName = v; return this; }
    public AssumeRoleRequest build() { return new AssumeRoleRequest(this); }
  }
}
