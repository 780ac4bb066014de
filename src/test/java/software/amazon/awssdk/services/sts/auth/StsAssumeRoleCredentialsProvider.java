package software.amazon.awssdk.services.sts.auth;

import software.amazon.awssdk.services.sts.StsClient;
import software.amazon.awssdk.services.sts.model.AssumeRoleRequest;

/** Signature-contract stub for the engine's reflective STS binding. */
public class StsAssumeRoleCredentialsProvider {
  public final StsClient stsClient;
  public final AssumeRoleRequest refreshRequest;
  private StsAssumeRoleCredentialsProvider(Builder b) {
    this.stsClient = b.stsClient;
    this.refreshRequest = b.refreshRequest;
  }
  public static Builder builder() { return new Builder(); }
  public static class Builder {
    private StsClient stsClient;
    private AssumeRoleRequest refreshRequest;
    public Builder stsClient(StsClient c) { this.stsClient = c; return this; }
    public Builder refreshRequest(AssumeRoleRequest r) { this.refreshRequest = r; return this; }
    public StsAssumeRoleCredentialsProvider build() {
      return new StsAssumeRoleCredentialsProvider(this);
    }
  }
}
